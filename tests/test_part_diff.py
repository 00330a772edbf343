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
