"""Cross-run schema evolution (C59, schema.schema_fingerprint /
schema_history + CLI `history --schemas`). SQL-oracle twin:
`schema_history_orders` in the driver contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli
from bigdime_spark.schema import (
    SCHEMA_BREAKING,
    schema_fingerprint,
    schema_history,
)

FP = "ordinal int, column string, dtype string, run_id string"


def test_fingerprint_shape(spark):
    df = spark.createDataFrame([(1, "x", 2.0)], "a bigint, b string, c double")
    got = {r["column"]: r for r in schema_fingerprint(df).collect()}
    assert [got[c]["ordinal"] for c in ("a", "b", "c")] == [0, 1, 2]
    assert got["c"]["dtype"] == "double"


def test_every_status_class(spark):
    rows = [
        # stable across all three runs
        (0, "keep", "bigint", "r1"), (0, "keep", "bigint", "r2"),
        (0, "keep", "bigint", "r3"),
        # dropped after r2
        (1, "gone", "string", "r1"), (1, "gone", "string", "r2"),
        # type change in r3
        (2, "retyped", "int", "r1"), (2, "retyped", "int", "r2"),
        (2, "retyped", "bigint", "r3"),
        # added in r2
        (3, "fresh", "int", "r2"), (3, "fresh", "int", "r3"),
        # intermittent: r1 and r3, missing r2
        (4, "flappy", "int", "r1"), (4, "flappy", "int", "r3"),
        # moved: ordinal 5 -> 9
        (5, "shuffled", "int", "r1"), (5, "shuffled", "int", "r2"),
        (9, "shuffled", "int", "r3"),
    ]
    got = {
        r["column"]: r
        for r in schema_history(spark.createDataFrame(rows, FP)).collect()
    }
    assert got["keep"]["status"] == "stable" and got["keep"]["detail"] == ""
    assert got["gone"]["status"] == "dropped"
    assert got["gone"]["detail"] == "last seen in r2"
    assert got["retyped"]["status"] == "type_changed"
    assert got["retyped"]["latest_dtype"] == "bigint"
    assert got["fresh"]["status"] == "added"
    assert got["flappy"]["status"] == "intermittent"
    assert got["flappy"]["detail"] == "seen 2/3 runs in span"
    assert got["shuffled"]["status"] == "moved"
    assert got["shuffled"]["detail"] == "ordinal 5 -> 9"


def test_precedence_dropped_beats_type_changed(spark):
    rows = [
        (0, "x", "int", "r1"), (0, "x", "bigint", "r2"),
        (0, "other", "int", "r1"), (0, "other", "int", "r2"),
        (0, "other", "int", "r3"),
    ]
    got = {
        r["column"]: r["status"]
        for r in schema_history(spark.createDataFrame(rows, FP)).collect()
    }
    # x is retyped AND absent from r3: dropped wins (the louder fact)
    assert got["x"] == "dropped"


def test_single_run_all_stable(spark):
    rows = [(0, "a", "int", "r1"), (1, "b", "string", "r1")]
    out = schema_history(spark.createDataFrame(rows, FP)).collect()
    assert {r["status"] for r in out} == {"stable"}


def test_refusals(spark):
    with pytest.raises(ValueError, match="run_id"):
        schema_history(
            spark.createDataFrame([(0, "a", "int")],
                                  "ordinal int, column string, dtype string")
        )
    dup = [(0, "a", "int", "r1"), (0, "a", "int", "r1")]
    with pytest.raises(ValueError, match="duplicate"):
        schema_history(spark.createDataFrame(dup, FP))
    with pytest.raises(ValueError, match="empty"):
        schema_history(spark.createDataFrame([], FP))


def test_cli_history_schemas_mode(spark, tmp_path_factory, capsys):
    """run writes <out>/schema run_id-stamped; a stable two-run union
    exits 0; a planted drop exits 1 with the changed row; passing
    both/neither source flags exits 2."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("schemahist")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/schema")
    assert {r["run_id"] for r in s1.select("run_id").distinct().collect()} \
        == {"r0001"}
    s2 = s1.withColumn("run_id", F.lit("r0002"))
    s1.unionByName(s2).write.parquet(f"{d}/hist_ok")
    capsys.readouterr()
    assert cli.main(["history", "--schemas", f"{d}/hist_ok"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "schemas" and out["changed"] == []
    # r0002 loses the caption column → dropped → exit 1
    s2b = s2.filter(F.col("column") != "caption")
    s1.unionByName(s2b).write.parquet(f"{d}/hist_bad")
    capsys.readouterr()
    rc = cli.main(["history", "--schemas", f"{d}/hist_bad"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["statuses"]["dropped"] == 1
    assert out["changed"][0]["column"] == "caption"
    capsys.readouterr()
    assert cli.main(["history", "--schemas", f"{d}/hist_ok",
                     "--verdicts", f"{d}/o1/verdicts"]) == 2
    capsys.readouterr()
    assert cli.main(["history"]) == 2
    assert set(SCHEMA_BREAKING) == {"dropped", "type_changed", "intermittent"}
