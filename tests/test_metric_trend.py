"""Run-over-run metric anomaly detection
(operators/outliers.metric_trend + CLI `trend`). SQL-oracle twin:
`metric_trend_orders` in the driver contract.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli
from bigdime_spark.operators.outliers import metric_trend

SCHEMA = "run_id string, part string, rows double, bytes double"


def _trend(spark, rows, **kw):
    return metric_trend(
        spark.createDataFrame(rows, SCHEMA), ["rows", "bytes"], **kw
    )


def test_verdict_classes(spark):
    rows = [
        # p0: rows stable, bytes collapses 60% → ANOMALY
        ("r1", "p0", 100.0, 1000.0),
        ("r2", "p0", 102.0, 1010.0),
        ("r3", "p0", 101.0, 400.0),
        # p1: rows goes 0 → 5 (infinite rate), bytes NULL latest
        ("r1", "p1", 0.0, 50.0),
        ("r2", "p1", 0.0, 50.0),
        ("r3", "p1", 5.0, None),
    ]
    out = {(r["part"], r["metric"]): r for r in _trend(spark, rows).collect()}
    assert len(out) == 4
    r = out[("p0", "rows")]
    assert r["verdict"] == "OK" and r["run_id"] == "r3"
    assert r["prev_run_id"] == "r2" and r["prev_value"] == 102.0
    b = out[("p0", "bytes")]
    assert b["verdict"] == "ANOMALY"
    assert b["rel_change"] == round(abs(400.0 - 1010.0) / 1010.0, 6)
    z = out[("p1", "rows")]
    assert z["verdict"] == "ANOMALY" and z["rel_change"] is None
    n = out[("p1", "bytes")]
    assert n["verdict"] == "NOT_READY" and n["value"] is None


def test_single_run_not_ready_and_zero_stable(spark):
    rows = [("r1", "p0", 7.0, 0.0), ("r2", "p0", 7.0, 0.0)]
    out = {(r["part"], r["metric"]): r for r in _trend(spark, rows).collect()}
    assert out[("p0", "bytes")]["verdict"] == "OK"  # 0 → 0 is stable
    single = {
        r["metric"]: r
        for r in _trend(spark, [("r1", "p0", 7.0, 1.0)]).collect()
    }
    assert all(r["verdict"] == "NOT_READY" for r in single.values())


def test_threshold_is_strict(spark):
    rows = [("r1", "p0", 100.0, 100.0), ("r2", "p0", 150.0, 151.0)]
    out = {
        r["metric"]: r
        for r in _trend(spark, rows, max_rel_change=0.5).collect()
    }
    assert out["rows"]["verdict"] == "OK"  # exactly 0.5 is not above
    assert out["bytes"]["verdict"] == "ANOMALY"  # 0.51 is


def test_refusals(spark):
    df = [("r1", "p0", 1.0, 1.0)]
    with pytest.raises(ValueError, match="run_id"):
        metric_trend(
            spark.createDataFrame([("p0", 1.0)], "part string, rows double"),
            ["rows"],
        )
    with pytest.raises(ValueError, match="max_rel_change"):
        _trend(spark, df, max_rel_change=0.0)
    with pytest.raises(ValueError, match="at least one"):
        metric_trend(spark.createDataFrame(df, SCHEMA), [])
    with pytest.raises(ValueError, match="not in history"):
        metric_trend(spark.createDataFrame(df, SCHEMA), ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        _trend(spark, df + df).collect()


def test_cli_trend_and_run_stamps_stats(spark, tmp_path_factory, capsys):
    """The run CLI stamps run_id on <out>/stats; two runs' stats union
    into the trend history, and a planted metric collapse exits 1."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("trend")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/stats")
    assert {r["run_id"] for r in s1.select("run_id").distinct().collect()} == {"r0001"}
    # second "run": same stats restamped with one metric collapsed 90%
    s2 = s1.withColumn("run_id", F.lit("r0002")).withColumn(
        "stat__rows", (F.col("stat__rows") / 10).cast(dict(s1.dtypes)["stat__rows"])
    )
    s1.unionByName(s2).write.parquet(f"{d}/hist")
    capsys.readouterr()
    rc = cli.main(["trend", "--history", f"{d}/hist", "--metrics", "stat__rows"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["verdicts"]["ANOMALY"] == 2  # both parts collapsed
    assert out["worst"][0]["metric"] == "stat__rows"
    # stable history → exit 0
    s3 = s1.withColumn("run_id", F.lit("r0002"))
    s1.unionByName(s3).write.parquet(f"{d}/hist_ok")
    assert cli.main(["trend", "--history", f"{d}/hist_ok",
                     "--metrics", "stat__rows"]) == 0
    capsys.readouterr()
    # operator error → exit 2
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "nope"]) == 2
