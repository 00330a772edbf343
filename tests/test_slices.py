"""Violation-slice lift (operators/slices, C69): exact per-slice
counts and lift arithmetic on a hand-computed frame, null segments,
pair slices, support pruning, zero-violation degeneracy, the triage
ranking, and the one-scan plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.slices import top_slices, violation_slices


def _mk(spark):
    # 8 rows; viol = flag; fmt: jpeg 1/4 viol, webp 3/4 viol, null 0/0...
    rows = [
        ("jpeg", "a", False),
        ("jpeg", "a", False),
        ("jpeg", "b", False),
        ("jpeg", "b", True),
        ("webp", "a", True),
        ("webp", "a", True),
        ("webp", None, True),
        ("webp", None, False),
    ]
    return spark.createDataFrame(rows, "fmt string, src string, flag boolean")


def test_exact_counts_and_lift(spark):
    out = {
        (r["dim"], r["value"]): r
        for r in violation_slices(
            _mk(spark), F.col("flag"), ["fmt", "src"]
        ).collect()
    }
    # global: 8 rows, 4 violations → rate 0.5
    j = out[("fmt", "jpeg")]
    assert (j["n"], j["n_viol"]) == (4, 1)
    assert j["viol_rate"] == 0.25 and j["global_rate"] == 0.5
    assert j["lift"] == 0.5
    w = out[("fmt", "webp")]
    assert (w["n"], w["n_viol"], w["lift"]) == (4, 3, 1.5)
    # NULL is a segment too
    nul = out[("src", None)]
    assert (nul["n"], nul["n_viol"]) == (2, 1)
    assert nul["lift"] == 1.0
    # no sentinel row leaks
    assert all(d != "__all__" for d, _ in out)


def test_pair_slices_and_null_token(spark):
    out = {
        (r["dim"], r["value"]): r
        for r in violation_slices(
            _mk(spark), F.col("flag"), ["fmt", "src"], include_pairs=True
        ).collect()
    }
    p = out[("fmt×src", "webp|∅")]
    assert (p["n"], p["n_viol"]) == (2, 1)
    assert ("fmt×src", "jpeg|a") in out
    # singles still present alongside pairs
    assert ("fmt", "jpeg") in out


def test_min_support_prunes(spark):
    out = violation_slices(
        _mk(spark), F.col("flag"), ["fmt", "src"], min_support=3
    ).collect()
    vals = {(r["dim"], r["value"]) for r in out}
    assert ("src", None) not in vals  # n=2 pruned
    assert ("fmt", "jpeg") in vals


def test_zero_violations_lift_null(spark):
    out = violation_slices(_mk(spark), F.lit(False), ["fmt"]).collect()
    assert all(r["lift"] is None for r in out)
    assert all(r["global_rate"] == 0.0 for r in out)


def test_null_predicate_counts_nonviolating(spark):
    # NULL flag rows land in n but never in n_viol (SQL CASE convention)
    df = spark.createDataFrame(
        [("a", True), ("a", None), ("a", False)], "d string, fl boolean"
    )
    r = violation_slices(df, F.col("fl"), ["d"]).collect()[0]
    assert (r["n"], r["n_viol"]) == (3, 1)


def test_guards(spark):
    df = _mk(spark)
    with pytest.raises(ValueError, match="non-empty"):
        violation_slices(df, F.col("flag"), [])
    with pytest.raises(ValueError, match="reserved"):
        violation_slices(df, F.col("flag"), ["__all__"])
    with pytest.raises(ValueError, match="min_support"):
        violation_slices(df, F.col("flag"), ["fmt"], min_support=0)
    with pytest.raises(ValueError, match="top_n"):
        top_slices(df, F.col("flag"), ["fmt"], top_n=0)


def test_top_slices_ranking(spark):
    rows = top_slices(
        _mk(spark), F.col("flag"), ["fmt", "src"], top_n=2
    ).collect()
    assert len(rows) == 2
    # webp (lift 1.5) first; then src=a and src=None tie at lift 1.0
    # with n_viol 3 vs 1 → src=a
    assert (rows[0]["dim"], rows[0]["value"]) == ("fmt", "webp")
    assert (rows[1]["dim"], rows[1]["value"]) == ("src", "a")


def test_one_scan_plan(spark):
    """The |dims|-way breakdown must stay ONE corpus aggregation: a
    single hashpartitioning exchange feeds the agg; the only
    SinglePartition exchange is the post-agg metadata-scale window."""
    df = spark.range(1000).select(
        (F.col("id") % 5).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
        (F.col("id") % 7 == 0).alias("fl"),
    )
    out = violation_slices(df, F.col("fl"), ["a", "b"], include_pairs=True)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    import re

    # formatted mode lists node names in the tree and partitioning in
    # the Arguments section — count the hash exchanges by argument
    hashex = re.findall(r"hashpartitioning\(", plan)
    assert len(hashex) == 1, plan
    # map-side partial aggregation feeds that one exchange, and the
    # SinglePartition exchange consumes the AGGREGATED frame (it
    # appears downstream of the agg in the formatted tree)
    assert plan.index("HashAggregate") < plan.index("SinglePartition")


def test_matches_independent_per_dim_groupby(spark):
    """Property: the one-scan explode+agg equals the naive one-groupBy-
    per-dimension computation on a seeded random frame."""
    df = spark.range(500).select(
        (F.xxhash64("id") % 4).cast("string").alias("a"),
        (F.xxhash64("id", F.lit(1)) % 6).cast("string").alias("b"),
        (F.xxhash64("id", F.lit(2)) % 5 == 0).alias("fl"),
    )
    got = {
        (r["dim"], r["value"]): (r["n"], r["n_viol"])
        for r in violation_slices(df, F.col("fl"), ["a", "b"]).collect()
    }
    for dim in ("a", "b"):
        ref = df.groupBy(dim).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("fl"), 1).otherwise(0)).alias("nv"),
        )
        for r in ref.collect():
            assert got[(dim, r[dim])] == (r["n"], r["nv"])
