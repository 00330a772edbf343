"""Cross-run part-diff / incremental-run planner oracles
(plans/lineage.part_diff, plan_incremental, CLI `plan`): each status
is decided exactly, comparison is null-safe, the planner output feeds
`run --parts`, and errors follow the clean exit-2 contract.
"""

from __future__ import annotations

import json

import pytest

from bigdime_spark import cli
from bigdime_spark.plans.lineage import part_diff, plan_incremental


def _frames(spark):
    prev = spark.createDataFrame(
        [
            ("p0", 100, 7, None),      # unchanged (incl. NULL==NULL)
            ("p1", 200, 9, 1.5),       # changed: rows moved
            ("p2", 300, 11, 2.5),      # removed
            ("p4", 50, 3, None),       # changed: NULL -> value
        ],
        "part string, n_rows int, checksum int, extra double",
    )
    cur = spark.createDataFrame(
        [
            ("p0", 100, 7, None),
            ("p1", 201, 10, 1.5),
            ("p3", 400, 13, 3.5),      # added
            ("p4", 50, 3, 9.9),
        ],
        "part string, n_rows int, checksum int, extra double",
    )
    return prev, cur


def test_part_diff_statuses_exact(spark):
    prev, cur = _frames(spark)
    got = {r["part"]: r for r in part_diff(prev, cur).collect()}
    assert got["p0"]["status"] == "unchanged" and got["p0"]["changed_cols"] is None
    assert got["p1"]["status"] == "changed"
    assert got["p1"]["changed_cols"] == "n_rows,checksum"
    assert got["p2"]["status"] == "removed"
    assert got["p3"]["status"] == "added"
    # null-safe: NULL vs value IS a change
    assert got["p4"]["status"] == "changed"
    assert got["p4"]["changed_cols"] == "extra"


def test_part_diff_compare_cols_subset(spark):
    prev, cur = _frames(spark)
    got = {
        r["part"]: r["status"]
        for r in part_diff(prev, cur, compare_cols=["n_rows"]).collect()
    }
    # with extra ignored, p4 is unchanged; p1 still changed via n_rows
    assert got["p4"] == "unchanged"
    assert got["p1"] == "changed"
    with pytest.raises(ValueError, match="no shared columns"):
        part_diff(prev.select("part"), cur.select("part"))


def test_plan_incremental_feeds_run_parts(spark):
    prev, cur = _frames(spark)
    plan = plan_incremental(prev, cur)
    assert plan == {"to_validate": ["p1", "p3", "p4"], "removed": ["p2"]}


def test_cli_plan_end_to_end(spark, tmp_path_factory, capsys):
    prev, cur = _frames(spark)
    base = str(tmp_path_factory.mktemp("plan"))
    prev.write.parquet(f"{base}/prev")
    cur.write.parquet(f"{base}/cur")
    rc = cli.main(["plan", "--prev", f"{base}/prev", "--cur", f"{base}/cur"])
    out = capsys.readouterr().out
    summary = json.loads(
        [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert rc == 0
    assert summary["to_validate"] == ["p1", "p3", "p4"]
    assert summary["removed"] == ["p2"]
    assert summary["n_to_validate"] == 3
    assert summary["unchanged"] == 1
    # operator-error contract: no shared columns -> stderr + exit 2
    prev.select("part").write.parquet(f"{base}/prev2")
    cur.select("part").write.parquet(f"{base}/cur2")
    rc2 = cli.main(["plan", "--prev", f"{base}/prev2", "--cur", f"{base}/cur2"])
    err = capsys.readouterr().err
    assert rc2 == 2 and "no shared columns" in err


# -------------------------------------------------- duplicate parts


def test_duplicate_parts_finds_planted_double_write(spark):
    from bigdime_spark.plans.lineage import duplicate_parts

    m = spark.createDataFrame(
        [("p0", 10, 5.0), ("p1", 10, 5.0), ("p2", 7, 5.0),
         ("p3", None, None), ("p4", None, None), ("p5", 3, 1.0)],
        "part string, rows int, tot double",
    )
    got = {r["parts_csv"]: r for r in duplicate_parts(m).collect()}
    # identical vectors group; NULL vectors match each other (null-safe)
    assert set(got) == {"p0,p1", "p3,p4"}
    assert all(r["n_parts"] == 2 for r in got.values())


def test_duplicate_parts_sample_bounded_count_exact(spark):
    from bigdime_spark.plans.lineage import duplicate_parts

    m = spark.createDataFrame(
        [(f"p{i:02d}", 1) for i in range(30)], "part string, rows int"
    )
    row = duplicate_parts(m, max_sample=5).collect()[0]
    assert row["n_parts"] == 30
    assert row["parts_csv"].split(",") == [f"p{i:02d}" for i in range(5)]


def test_duplicate_parts_compare_cols_subset(spark):
    from bigdime_spark.plans.lineage import duplicate_parts

    m = spark.createDataFrame(
        [("p0", 10, 1.0), ("p1", 10, 2.0)], "part string, rows int, tot double"
    )
    assert duplicate_parts(m).count() == 0  # full vectors differ
    sub = duplicate_parts(m, compare_cols=["rows"]).collect()
    assert len(sub) == 1 and sub[0]["parts_csv"] == "p0,p1"


def test_duplicate_parts_refusals(spark):
    import pytest as _pytest

    from bigdime_spark.plans.lineage import duplicate_parts

    m = spark.createDataFrame([("p0", 1)], "part string, rows int")
    with _pytest.raises(ValueError, match="no columns"):
        duplicate_parts(m, compare_cols=["nope"])
    with _pytest.raises(ValueError, match="no metric columns"):
        duplicate_parts(m.select("part"))
    # explicit [] must refuse too, not silently fall back to
    # compare-everything (a dynamically-built allowlist can be empty)
    with _pytest.raises(ValueError, match="no metric columns"):
        duplicate_parts(m, compare_cols=[])
