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


# ------------------------------------------------ per-part / cross-run

def test_part_sketches_match_python_replay(spark, orders):
    """The two-level (salted) bottom-k must equal a single-level
    replay: per part, the k smallest distinct hashes."""
    got = {
        r["part"]: (r["n_kept"], list(r["hashes"]))
        for r in kmv.kmv_part_sketches(
            orders, "o_orderpriority", "o_orderkey", k=32, salt_buckets=4
        ).collect()
    }
    rows = orders.select(
        F.col("o_orderpriority").alias("part"),
        kmv.kmv_hash(F.col("o_orderkey")).alias("h"),
    ).collect()
    ref: dict[str, set[int]] = {}
    for r in rows:
        ref.setdefault(r["part"], set()).add(r["h"])
    for part, hashes in ref.items():
        want = sorted(hashes)[:32]
        assert got[part] == (len(want), want)


def test_part_sketches_salt_bucket_invariance(spark, orders):
    a = kmv.kmv_part_sketches(
        orders, "o_orderpriority", "o_orderkey", k=16, salt_buckets=2
    ).collect()
    b = kmv.kmv_part_sketches(
        orders, "o_orderpriority", "o_orderkey", k=16, salt_buckets=128
    ).collect()
    assert {r["part"]: r["hashes"] for r in a} == {
        r["part"]: r["hashes"] for r in b
    }


def test_churn_subset_slice_loses_more_than_it_gains(spark, orders):
    prev = kmv.kmv_part_sketches(orders, "o_orderpriority", "o_orderkey", k=64)
    cur = kmv.kmv_part_sketches(
        orders.filter(F.col("o_orderkey") % 4 != 0),
        "o_orderpriority", "o_orderkey", k=64,
    )
    for r in kmv.kmv_churn(prev, cur).collect():
        # a 75% subset: jaccard ≈ 0.75 (k=64 noise band), loss ≈ 25%
        assert 0.55 < r["jaccard_est"] < 0.95, r
        assert r["lost_est"] > r["new_est"], r
        assert r["n_prev_est"] > r["n_cur_est"], r


def test_churn_full_outer_reports_one_sided_parts(spark, orders):
    prev = kmv.kmv_part_sketches(
        orders.filter(F.col("o_orderpriority") != "5-LOW"),
        "o_orderpriority", "o_orderkey", k=32,
    )
    cur = kmv.kmv_part_sketches(orders, "o_orderpriority", "o_orderkey", k=32)
    rows = {r["part"]: r for r in kmv.kmv_churn(prev, cur).collect()}
    low = rows["5-LOW"]  # present only in cur: everything is new
    assert low["n_prev_est"] == 0.0 and low["jaccard_est"] == 0.0
    assert low["new_est"] == low["n_cur_est"] > 0
    assert low["lost_est"] == 0.0


def test_part_sketches_plan_no_single_partition(spark, orders):
    plan = _explain(
        kmv.kmv_part_sketches(orders, "o_orderpriority", "o_orderkey", k=32)
    )
    assert "SinglePartition" not in plan
    with pytest.raises(ValueError, match="k must be"):
        kmv.kmv_part_sketches(orders, "o_orderpriority", "o_orderkey", k=1)


def test_stamp_multi_column_shape(spark, orders):
    """kmv_stamp = one kmv_part_sketches frame per column, tagged —
    each column slice must equal its standalone sketch frame."""
    st = kmv.kmv_stamp(
        orders, "o_orderpriority", ("o_orderkey", "o_custkey"), k=16
    )
    assert st.columns == ["column", "part", "k", "n_kept", "hashes"]
    got = {
        (r["column"], r["part"]): list(r["hashes"]) for r in st.collect()
    }
    for c in ("o_orderkey", "o_custkey"):
        solo = kmv.kmv_part_sketches(orders, "o_orderpriority", c, k=16)
        for r in solo.collect():
            assert got[(c, r["part"])] == list(r["hashes"])
    with pytest.raises(ValueError, match="non-empty"):
        kmv.kmv_stamp(orders, "o_orderpriority", ())


def test_run_churn_compares_latest_two_runs_only(spark, orders):
    """Three stamped runs where r0001 is wildly different: churn must
    compare r0002 vs r0003 (identical inputs → zero churn), proving
    the latest-two selection ignores older runs."""
    noise = kmv.kmv_stamp(
        orders.limit(50), "o_orderpriority", ("o_orderkey",), k=32
    ).withColumn("run_id", F.lit("r0001"))
    full = kmv.kmv_stamp(orders, "o_orderpriority", ("o_orderkey",), k=32)
    acc = noise.unionByName(
        full.withColumn("run_id", F.lit("r0002"))
    ).unionByName(full.withColumn("run_id", F.lit("r0003")))
    for r in kmv.kmv_run_churn(acc).collect():
        assert r["jaccard_est"] == 1.0, r
        assert r["new_est"] == 0.0 == r["lost_est"], r
    with pytest.raises(ValueError, match=">= 2 runs"):
        kmv.kmv_run_churn(full.withColumn("run_id", F.lit("only")))
