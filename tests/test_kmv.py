"""KMV bottom-k distinct/overlap sketches (operators/kmv): estimator
accuracy within theory bounds, exact degradation below k, merge
validity against a sketch of the unioned input, and a top-k plan
(never a global sort)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators import kmv

SF = "/root/testdata/sf0.01"


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet").cache()


def test_distinct_estimate_within_theory_bounds(spark, orders):
    """Relative error of the KMV distinct estimator is ~1/sqrt(k-1)
    (≈6.3% at k=256); assert within 3σ on the 15,000-key fixture."""
    sk = kmv.kmv_sketch(orders, "o_orderkey", k=256)
    r = sk.first()
    assert r["n_kept"] == 256
    est = 255.0 * kmv.KMV_SPACE / r["hashes"][-1]
    exact = orders.select("o_orderkey").distinct().count()
    assert abs(est - exact) / exact < 3 / (255 ** 0.5)


def test_unsaturated_sketch_is_exact(spark, orders):
    small = orders.limit(100)
    r = kmv.kmv_overlap(small, "o_orderkey", small, "o_orderkey", k=256).first()
    assert r["n_a_est"] == 100.0 == r["n_b_est"] == r["union_est"]
    assert r["jaccard_est"] == 1.0 and r["intersect_est"] == 100.0


def test_overlap_estimates_track_exact_fractions(spark, orders):
    """Full key set vs its F-status slice: jaccard must estimate
    |slice|/|full| (the slice is a subset) within 3σ binomial noise
    on the 256-sample union sketch."""
    sl = orders.filter(F.col("o_orderstatus") == "F")
    exact_full = orders.select("o_orderkey").distinct().count()
    exact_slice = sl.select("o_orderkey").distinct().count()
    true_j = exact_slice / exact_full
    r = kmv.kmv_overlap(orders, "o_orderkey", sl, "o_orderkey", k=256).first()
    sigma = (true_j * (1 - true_j) / 256) ** 0.5
    assert abs(r["jaccard_est"] - true_j) < 3 * sigma
    assert abs(r["intersect_est"] - exact_slice) / exact_slice < 0.25


def test_disjoint_sets_estimate_zero_overlap(spark):
    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(100000, 103000).select(F.col("id").alias("v"))
    r = kmv.kmv_overlap(a, "v", b, "v", k=128).first()
    assert r["jaccard_est"] == 0.0 and r["intersect_est"] == 0.0


def test_merge_equals_sketch_of_union(spark, orders):
    """The compare path's merged bottom-k must BE the union's sketch:
    replay the merge in python from the two hash arrays and check it
    against kmv_sketch of the unioned input (both sides saturated, so
    theta = min of the two maxima)."""
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 3 == 0)
    ka = kmv.kmv_sketch(a, "o_orderkey", k=64).first()["hashes"]
    kb = kmv.kmv_sketch(b, "o_orderkey", k=64).first()["hashes"]
    theta = min(ka[-1], kb[-1])
    merged = sorted(x for x in set(ka) | set(kb) if x <= theta)[:64]
    u = kmv.kmv_sketch(
        a.select("o_orderkey").union(b.select("o_orderkey")), "o_orderkey", k=64
    ).first()["hashes"]
    assert merged == list(u)[: len(merged)]


def test_nulls_excluded_and_guards(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], "v int")
    r = kmv.kmv_sketch(df, "v", k=8).first()
    assert r["n_kept"] == 2
    with pytest.raises(ValueError, match="k must be"):
        kmv.kmv_sketch(df, "v", k=1)


def test_sketch_plan_is_topk_not_global_sort(spark, orders):
    plan = _explain(kmv.kmv_sketch(orders, "o_orderkey", k=256))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]
