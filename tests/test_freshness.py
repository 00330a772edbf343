"""Freshness/staleness validator oracles (operators/freshness): a
stalled producer FAILs, fresh partitions PASS, an all-null timestamp
column is NOT_READY, and the constraint fuses into the suite's single
stats pass with deterministic as_of semantics.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdime_spark.operators.freshness import Freshness, freshness_profile
from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
from bigdime_spark.schema import FAIL, NOT_READY, PASS

AS_OF = "2024-06-01 12:00:00"


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frame(spark):
    rows = [
        # fresh: newest row 10 min before as_of
        ("p0", "img-0", _ts("2024-06-01 11:20:00")),
        ("p0", "img-1", _ts("2024-06-01 11:50:00")),
        # stale: newest row 2 h before as_of
        ("p1", "img-2", _ts("2024-06-01 10:00:00")),
        ("p1", "img-3", _ts("2024-06-01 09:00:00")),
        # all-null ts: producer bug, not fresh data
        ("p2", "img-4", None),
        ("p2", "img-5", None),
    ]
    return spark.createDataFrame(
        rows, "part string, image_id string, ingested_at timestamp"
    )


def test_freshness_profile_verdicts(spark):
    out = freshness_profile(
        _frame(spark), "ingested_at", as_of=AS_OF, max_lag_seconds=3600
    )
    got = {r["part"]: r for r in out.collect()}
    assert got["p0"]["verdict"] == PASS
    assert got["p0"]["lag_seconds"] == 600
    assert got["p0"]["max_ts"] == "2024-06-01 11:50:00"
    assert got["p1"]["verdict"] == FAIL
    assert got["p1"]["lag_seconds"] == 7200
    assert got["p2"]["verdict"] == NOT_READY
    assert got["p2"]["max_ts"] is None


def test_freshness_boundary_is_inclusive(spark):
    """A lag of exactly max_lag_seconds still PASSes (the budget is a
    bound, not a strict inequality) — one second more FAILs."""
    out = freshness_profile(
        _frame(spark), "ingested_at", as_of=AS_OF, max_lag_seconds=7200
    )
    assert {r["part"]: r["verdict"] for r in out.collect()}["p1"] == PASS
    out = freshness_profile(
        _frame(spark), "ingested_at", as_of=AS_OF, max_lag_seconds=7199
    )
    assert {r["part"]: r["verdict"] for r in out.collect()}["p1"] == FAIL


def test_freshness_rides_the_suite_stats_pass(spark):
    df = _frame(spark)
    suite = ValidationSuite(
        declared_schema=df.schema,
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        extra_agg_constraints=[
            Freshness("ingested_at", as_of=AS_OF, max_lag_seconds=3600)
        ],
    )
    res = suite.run(spark, df, run_id="fresh-test")
    v = {
        r["part"]: (r["verdict"], r["observed"])
        for r in res.verdicts.filter(
            F.col("constraint") == "freshness.ingested_at"
        ).collect()
    }
    assert v["p0"] == (PASS, "2024-06-01 11:50:00")
    assert v["p1"] == (FAIL, "2024-06-01 10:00:00")
    assert v["p2"] == (NOT_READY, None)
    res.release()


def test_freshness_deterministic_under_rerun(spark):
    """Same as_of → identical verdicts on a re-run (the resume/retry
    contract); nothing in the constraint reads the wall clock."""
    df = _frame(spark)
    a = freshness_profile(df, "ingested_at", as_of=AS_OF, max_lag_seconds=3600)
    b = freshness_profile(df, "ingested_at", as_of=AS_OF, max_lag_seconds=3600)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
