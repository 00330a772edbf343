"""Round-2 coverage: B4 moments, B6 HLL roll-up, B8 byte lengths,
B10 count-min heavy hitters, B11 type conformance, and the PHYSICAL
hot-key fan-out property of the salted aggregation (the salt must
spread a hot key over >1 stage-1 group — VERDICT r01 'What's wrong' #1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.functions import skew
from bigdime_spark.operators.row_checks import TypeConformance
from bigdime_spark.operators.stats import ColumnProfile, StatsProfile, rollup_distinct
from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.schema import FAIL, PASS


def _hot_df(spark, n=4000):
    rows = [(i, "hot" if i % 10 < 7 else f"k{i % 97}") for i in range(n)]
    return spark.createDataFrame(rows, "i long, key string").repartition(8)


# ----------------------------------------------------------- salting

def test_stage1_fans_out_hot_key_with_row_salt(spark):
    df = _hot_df(spark)
    s1 = skew.salted_stage1(df, "key", ("i",), [F.count(F.lit(1)).alias("_c")], buckets=16)
    hot_groups = s1.filter(F.col("key") == "hot").count()
    assert hot_groups > 1  # the physical property: hot key spread over reducers


def test_stage1_fans_out_hot_key_with_default_salt(spark):
    # no salt columns given → physical-split salt must STILL fan out
    df = _hot_df(spark)
    s1 = skew.salted_stage1(df, "key", None, [F.count(F.lit(1)).alias("_c")], buckets=16)
    hot_groups = s1.filter(F.col("key") == "hot").count()
    assert hot_groups > 1


def test_hot_keys_values_still_exact(spark):
    df = _hot_df(spark)
    hot = {r["key"]: (r["n"], r["ratio"]) for r in skew.hot_keys(df, "key", 0.05).collect()}
    assert set(hot) == {"hot"}
    assert hot["hot"][0] == df.filter(F.col("key") == "hot").count()


# ------------------------------------------------------- CMS (B10)

def test_cms_heavy_hitters_estimate(spark):
    df = spark.createDataFrame(
        [(f"p{i % 4}", "hot" if i % 5 < 3 else f"k{i % 53}") for i in range(5000)],
        "part string, key string",
    )
    sketches = skew.cms_sketch_per_part(df, "key", eps=0.001, confidence=0.99)
    rows = sketches.collect()
    assert len(rows) == 4
    est = skew.cms_estimate(spark, rows, ["hot", "k1", "absent-key"])
    true_hot = df.filter(F.col("key") == "hot").count()
    true_k1 = df.filter(F.col("key") == "k1").count()
    # CMS never undercounts; overcount bounded by eps * N = 5
    assert true_hot <= est["hot"] <= true_hot + 5
    assert true_k1 <= est["k1"] <= true_k1 + 5
    assert 0 <= est["absent-key"] <= 5


def test_cms_heavy_hitters_long_keys(spark):
    """Pin the py4j boxing semantics for integer keys: the JVM sketch
    folds Numbers via longValue(), so python ints (small and >2^31)
    must estimate correctly."""
    big = 1 << 40
    df = spark.createDataFrame(
        [("p0", big if i % 3 == 0 else i % 7) for i in range(3000)],
        "part string, key long",
    )
    rows = skew.cms_sketch_per_part(df, "key", eps=0.001).collect()
    est = skew.cms_estimate(spark, rows, [big, 1, 999999])
    true_big = df.filter(F.col("key") == big).count()
    true_one = df.filter(F.col("key") == 1).count()
    assert true_big <= est[big] <= true_big + 3
    assert true_one <= est[1] <= true_one + 3
    assert 0 <= est[999999] <= 3


# ------------------------------------------------- HLL roll-up (B6)

def test_rollup_distinct_unions_sketches_across_snapshots(spark):
    prof = StatsProfile(columns=[ColumnProfile("uid", distinct=True)])
    # two 'snapshots' with overlapping key ranges: 0..2999 and 1500..4499
    snap1 = spark.createDataFrame(
        [(f"p{i % 4}", f"u{i}") for i in range(3000)], "part string, uid string"
    )
    snap2 = spark.createDataFrame(
        [(f"p{i % 4}", f"u{i}") for i in range(1500, 4500)], "part string, uid string"
    )
    s1 = snap1.groupBy("part").agg(*prof.agg_exprs())
    s2 = snap2.groupBy("part").agg(*prof.agg_exprs())
    est = rollup_distinct([s1, s2]).collect()[0]["stat__uid__distinct"]
    exact = 4500  # |0..4499|
    assert abs(est - exact) / exact < 0.05  # HLL lgK=12 tolerance


# -------------------------------------------- type conformance (B11)

def test_type_conformance_verdicts_and_violations(spark):
    df = spark.createDataFrame(
        [
            ("p0", "img-0", "17"),
            ("p0", "img-1", "42"),
            ("p1", "img-2", "not-a-number"),
            ("p1", "img-3", None),  # NULL is NOT a conformance violation
        ],
        "part string, image_id string, n_str string",
    )
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
        extra_agg_constraints=[TypeConformance("n_str", "int")],
    )
    res = suite.run(spark, df, run_id="tc-test")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "type_conformance.n_str"
        ).collect()
    }
    assert v == {"p0": PASS, "p1": FAIL}
    viol = res.violations.filter(
        F.col("constraint") == "type_conformance.n_str"
    ).collect()
    assert [(r["part"], r["image_id"]) for r in viol] == [("p1", "img-2")]
    res.release()


# ------------------------------------------- moments (B4) + bytes (B8)

def test_profile_emits_moments_and_byte_stats(spark):
    df = spark.createDataFrame(
        [("p0", float(i), bytes([i % 251] * (i + 1))) for i in range(100)],
        "part string, x double, payload binary",
    )
    prof = StatsProfile(
        columns=[
            ColumnProfile("x", numeric=True),
            ColumnProfile("payload", bytelike=True),
        ]
    )
    row = df.groupBy("part").agg(*prof.agg_exprs()).collect()[0]
    ref = df.agg(
        F.skewness("x").alias("sk"), F.kurtosis("x").alias("ku")
    ).collect()[0]
    assert row["stat__x__skewness"] == pytest.approx(ref["sk"])
    assert row["stat__x__kurtosis"] == pytest.approx(ref["ku"])
    assert row["stat__payload__min_bytes"] == 1
    assert row["stat__payload__max_bytes"] == 100
    assert row["stat__payload__sum_bytes"] == 100 * 101 // 2


# --------------------------------------------- per-part outlier scores

def test_robust_outliers_flag_planted_part(spark):
    """20 well-behaved parts plus one with 10x the rows: exactly that
    part is OUTLIER on the row-count metric, and the median/MAD are
    not dragged by the outlier itself (the point of robust scoring —
    a mean/stddev z-score over this frame scores the outlier at
    ~4.4 but inflates sigma so siblings look compressed)."""
    from bigdime_spark.operators.outliers import robust_part_outliers

    rows = [(f"p{i:02d}", 100.0 + (i % 5)) for i in range(20)] + [("p20", 1000.0)]
    stats = spark.createDataFrame(rows, "part string, n_rows double")
    got = {r["part"]: r for r in robust_part_outliers(stats, ["n_rows"]).collect()}
    assert got["p20"]["verdict"] == "OUTLIER"
    assert [p for p, r in got.items() if r["verdict"] == "OUTLIER"] == ["p20"]
    # robust center stays at the sibling level, untouched by the outlier
    assert 100.0 <= got["p20"]["med"] <= 104.0
    assert got["p20"]["robust_z"] > 3.5


def test_robust_outliers_mad_zero_degrades_to_exact_inequality(spark):
    """>=half the parts identical → MAD = 0: z is NULL (no division
    blow-up) and ANY deviating part is OUTLIER via exact inequality."""
    from bigdime_spark.operators.outliers import robust_part_outliers

    rows = [(f"p{i}", 50.0) for i in range(9)] + [("px", 51.0)]
    stats = spark.createDataFrame(rows, "part string, n_rows double")
    got = {r["part"]: r for r in robust_part_outliers(stats, ["n_rows"]).collect()}
    assert got["px"]["verdict"] == "OUTLIER" and got["px"]["robust_z"] is None
    assert got["p0"]["verdict"] == "OK"


def test_robust_outliers_null_metric_is_not_ready(spark):
    from bigdime_spark.operators.outliers import robust_part_outliers

    rows = [("p0", 1.0), ("p1", 2.0), ("p2", 3.0), ("p3", None)]
    stats = spark.createDataFrame(rows, "part string, m double")
    got = {r["part"]: r["verdict"] for r in robust_part_outliers(stats, ["m"]).collect()}
    assert got["p3"] == "NOT_READY" and got["p1"] == "OK"


def test_robust_outliers_refuses_missing_metric(spark):
    from bigdime_spark.operators.outliers import robust_part_outliers

    stats = spark.createDataFrame([("p0", 1.0)], "part string, m double")
    with pytest.raises(ValueError, match="not in stats frame"):
        robust_part_outliers(stats, ["nope"])
    with pytest.raises(ValueError, match="at least one"):
        robust_part_outliers(stats, [])
