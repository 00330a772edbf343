"""Physical file-layout profile / small-files detector
(operators/filelayout.py + CLI `files`). Oracled against an
independent os.walk + DuckDB reference over a fixture written with a
controlled files-per-partition layout (profiles physical FILES, not
table contents, so there is no driver-contract SQL form — the driver
tables are single parquet files by construction).
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli
from bigdime_spark.operators.filelayout import file_layout_profile, list_data_files


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """600 rows over 3 hive partitions; dom0 written as MANY small
    files (the pathology), dom1/dom2 as one file each."""
    d = str(tmp_path_factory.mktemp("flayout") / "t")
    rows = [(i, f"dom{i % 3}", f"text {i} " * 20) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    (
        df.filter(F.col("source") == "dom0")
        .repartition(10)
        .write.partitionBy("source")
        .parquet(d)
    )
    (
        df.filter(F.col("source") != "dom0")
        .repartition(1)
        .write.mode("append")
        .partitionBy("source")
        .parquet(d)
    )
    return d


def _walk_reference(d):
    """Independent reference: os.walk sizes + DuckDB per-file rows."""
    sizes, rows = {}, {}
    for root, _, names in os.walk(d):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            p = os.path.join(root, n)
            part = root.split("source=")[-1]
            sizes.setdefault(part, []).append(os.stat(p).st_size)
            n_rows = duckdb.sql(
                f"select count(*) from read_parquet('{p}')"
            ).fetchone()[0]
            rows.setdefault(part, []).append(n_rows)
    return sizes, rows


def test_profile_matches_walk_and_duckdb(spark, table):
    prof = {
        r["part"]: r
        for r in file_layout_profile(spark, table, part_col="source").collect()
    }
    sizes, rows = _walk_reference(table)
    assert set(prof) == set(sizes) == {"dom0", "dom1", "dom2"}
    for part in sizes:
        r = prof[part]
        assert r["n_files"] == len(sizes[part])
        assert r["n_rows"] == sum(rows[part])
        assert r["total_bytes"] == sum(sizes[part])
        assert r["min_file_bytes"] == min(sizes[part])
        assert r["max_file_bytes"] == max(sizes[part])
        assert r["n_empty"] == sum(1 for n in rows[part] if n == 0)
    assert prof["dom0"]["n_files"] == 10
    assert prof["dom1"]["n_files"] == 1


def test_small_file_gate(spark, table):
    # everything in this fixture is tiny → every file is "small" at
    # the default 32 MB floor; at 1 byte nothing is
    prof = {r["part"]: r for r in file_layout_profile(spark, table, "source").collect()}
    assert all(r["small_frac"] == 1.0 for r in prof.values())
    loose = {
        r["part"]: r
        for r in file_layout_profile(spark, table, "source", small_file_bytes=1).collect()
    }
    assert all(r["small_frac"] == 0.0 for r in loose.values())


def test_whole_table_mode_and_listing(spark, table):
    prof = file_layout_profile(spark, table).collect()
    assert len(prof) == 1 and prof[0]["part"] == "*"
    assert prof[0]["n_files"] == 12 and prof[0]["n_rows"] == 600
    files = list_data_files(spark, table)
    assert len(files) == 12
    assert all(not p.rsplit("/", 1)[-1].startswith(("_", ".")) for p, _ in files)


def test_rejections(spark, table, tmp_path_factory):
    with pytest.raises(ValueError, match="small_file_bytes"):
        file_layout_profile(spark, table, small_file_bytes=0)
    with pytest.raises(ValueError, match="no column"):
        file_layout_profile(spark, table, part_col="nope")
    empty = str(tmp_path_factory.mktemp("flempty"))
    with pytest.raises(ValueError, match="no data files"):
        file_layout_profile(spark, empty)


def test_cli_files(spark, table, capsys):
    rc = cli.main(["files", "--input", table, "--part-col", "source"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["n_parts"] == 3 and out["n_files"] == 12 and out["n_rows"] == 600
    assert out["worst"][0]["small_frac"] == 1.0
    # gated: everything is tiny → exceeds any fraction below 1
    assert cli.main([
        "files", "--input", table, "--part-col", "source",
        "--max-small-frac", "0.5",
    ]) == 1
    capsys.readouterr()
    assert cli.main(["files", "--input", f"{table}-missing"]) == 2


def test_plan_compaction(spark, table):
    from bigdime_spark.operators.filelayout import plan_compaction

    prof = file_layout_profile(spark, table, "source")
    # generous target: every partition fits in ONE file → the 10-file
    # partition compacts to 1, single-file partitions are ok
    plan = {r["part"]: r for r in plan_compaction(prof, 256 * 1024 * 1024).collect()}
    assert plan["dom0"]["action"] == "compact" and plan["dom0"]["target_files"] == 1
    assert plan["dom1"]["action"] == "ok"
    assert plan["dom2"]["action"] == "ok"
    # 1-byte target: every partition already holds fewer files than
    # its byte count justifies → nothing to compact
    tiny = {r["part"]: r for r in plan_compaction(prof, 1).collect()}
    assert all(r["action"] == "ok" for r in tiny.values())
    with pytest.raises(ValueError, match="target_file_bytes"):
        plan_compaction(prof, 0)


def test_cli_plan_compaction(spark, table, capsys):
    rc = cli.main([
        "files", "--input", table, "--part-col", "source",
        "--plan-compaction", "--target-file-mb", "256",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["compaction"] == [
        {"part": "dom0", "n_files": 10, "target_files": 1}
    ]
