"""distinct_value_profile / DistinctnessBound (deequ's Distinctness /
Uniqueness / UniqueValueRatio family): exact ratios per part, the
kept-row convention for all-null parts (NULL ratios, never dropped),
and the suite-integrated declared-bounds form.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.stats import DistinctnessBound, distinct_value_profile


def _rows_by(prof):
    return {(r["part"], r["column"]): r.asDict() for r in prof.collect()}


def test_distinct_value_profile_exact(spark):
    # p0.v: a a a b c NULL  → n_rows 6, nonnull 5, distinct 3, once 2
    # p1.v: x y z           → perfect key: all ratios 1.0
    # p2.v: NULL NULL       → undefined ratios, row KEPT
    rows = (
        [("p0", v) for v in ("a", "a", "a", "b", "c", None)]
        + [("p1", v) for v in ("x", "y", "z")]
        + [("p2", None), ("p2", None)]
    )
    df = spark.createDataFrame(rows, "part string, v string")
    got = _rows_by(distinct_value_profile(df, ("v",)))

    p0 = got[("p0", "v")]
    assert (p0["n_rows"], p0["n_nonnull"], p0["n_distinct"], p0["n_once"]) == (
        6, 5, 3, 2,
    )
    assert p0["distinctness"] == pytest.approx(3 / 5)
    assert p0["uniqueness"] == pytest.approx(2 / 5)
    assert p0["unique_value_ratio"] == pytest.approx(2 / 3)

    p1 = got[("p1", "v")]
    assert (p1["distinctness"], p1["uniqueness"], p1["unique_value_ratio"]) == (
        1.0, 1.0, 1.0,
    )

    p2 = got[("p2", "v")]
    assert (p2["n_rows"], p2["n_nonnull"], p2["n_distinct"], p2["n_once"]) == (
        2, 0, 0, 0,
    )
    assert p2["distinctness"] is None
    assert p2["uniqueness"] is None
    assert p2["unique_value_ratio"] is None


def test_distinct_value_profile_multi_column_and_types(spark):
    """Several columns melt into one pass; non-string columns profile
    via their string cast (the ratio only sees equality)."""
    df = spark.createDataFrame(
        [("p0", 1, "a"), ("p0", 1, "b"), ("p0", 2, "b")],
        "part string, k int, s string",
    )
    got = _rows_by(distinct_value_profile(df, ("k", "s")))
    assert got[("p0", "k")]["n_distinct"] == 2
    assert got[("p0", "k")]["n_once"] == 1  # value 2
    assert got[("p0", "s")]["n_distinct"] == 2
    assert got[("p0", "s")]["uniqueness"] == pytest.approx(1 / 3)  # only 'a'


def test_distinct_value_profile_matches_python_reference(spark):
    """Property check vs a pure-python reference on seeded random
    frames (the same discipline as the MI / null-pattern property
    tests)."""
    rng = random.Random(20260818)
    for trial in range(5):
        rows = [
            (
                f"p{rng.randrange(3)}",
                None if rng.random() < 0.15 else str(rng.randrange(8)),
            )
            for _ in range(rng.randrange(5, 60))
        ]
        df = spark.createDataFrame(rows, "part string, v string")
        got = _rows_by(distinct_value_profile(df, ("v",)))
        parts = {p for p, _ in rows}
        assert set(got) == {(p, "v") for p in parts}, trial
        for p in parts:
            vals = [v for q, v in rows if q == p]
            nonnull = [v for v in vals if v is not None]
            counts: dict[str, int] = {}
            for v in nonnull:
                counts[v] = counts.get(v, 0) + 1
            once = sum(1 for c in counts.values() if c == 1)
            r = got[(p, "v")]
            assert r["n_rows"] == len(vals), trial
            assert r["n_nonnull"] == len(nonnull), trial
            assert r["n_distinct"] == len(counts), trial
            assert r["n_once"] == once, trial
            if nonnull:
                assert r["distinctness"] == pytest.approx(len(counts) / len(nonnull))
                assert r["uniqueness"] == pytest.approx(once / len(nonnull))
                assert r["unique_value_ratio"] == pytest.approx(once / len(counts))
            else:
                assert r["distinctness"] is None


def _stats_frame(spark, df, cols, lg_k=16):
    from bigdime_spark.operators.stats import ColumnProfile, StatsProfile

    prof = StatsProfile(
        columns=[ColumnProfile(c, stringlike=True, distinct=True) for c in cols],
        hll_lg_k=lg_k,
    )
    return df.groupBy("part").agg(*prof.agg_exprs(include_histograms=False))


def test_distinctness_from_stats_exact_regime(spark):
    """In the sketch's sparse-exact regime the zero-rescan ratio must
    equal the exact value-level profile — incl. the null denominator
    and the all-null part (empty sketch → est 0, ratio NULL)."""
    from bigdime_spark.operators.stats import distinctness_from_stats

    rows = (
        [("p0", v) for v in ("a", "a", "b", "c", None)]
        + [("p1", None), ("p1", None)]
    )
    df = spark.createDataFrame(rows, "part string, v string")
    got = {
        r["part"]: r.asDict()
        for r in distinctness_from_stats(_stats_frame(spark, df, ("v",))).collect()
    }
    exact = _rows_by(distinct_value_profile(df, ("v",)))
    p0 = got["p0"]
    assert (p0["n_rows"], p0["n_nonnull"]) == (5, 4)
    assert p0["distinct_est"] == pytest.approx(exact[("p0", "v")]["n_distinct"])
    assert p0["distinctness_est"] == pytest.approx(3 / 4)
    p1 = got["p1"]
    assert p1["distinct_est"] == 0
    assert p1["distinctness_est"] is None


def test_distinctness_from_stats_rollup_matches_direct(spark):
    """table_level=True merges per-part sketches; in the exact regime
    the merged ratio equals profiling the unpartitioned frame
    directly (mergeability is the point of persisting sketches)."""
    from bigdime_spark.operators.stats import distinctness_from_stats

    rows = [(f"p{k % 4}", f"v{k % 37}") for k in range(200)]
    df = spark.createDataFrame(rows, "part string, v string")
    (roll,) = distinctness_from_stats(
        _stats_frame(spark, df, ("v",)), table_level=True
    ).collect()
    assert roll["part"] == "*"
    assert (roll["n_rows"], roll["n_nonnull"]) == (200, 200)
    assert roll["distinct_est"] == pytest.approx(37)
    assert roll["distinctness_est"] == pytest.approx(37 / 200)


def test_distinctness_from_stats_estimator_regime_tolerance(spark):
    """Past the sparse-exact bound the estimate carries HLL error —
    assert the documented tolerance (±2% at lg_k=12 is the published
    HLL bound; allow 5% head-room), not equality."""
    from bigdime_spark.operators.stats import distinctness_from_stats

    df = (
        spark.range(20000)
        .select(
            F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("part"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
    )
    out = {
        r["part"]: r.asDict()
        for r in distinctness_from_stats(
            _stats_frame(spark, df, ("v",), lg_k=12)
        ).collect()
    }
    for p in ("p0", "p1"):
        assert out[p]["n_nonnull"] == 10000
        assert out[p]["distinct_est"] == pytest.approx(10000, rel=0.05)
        assert out[p]["distinctness_est"] == pytest.approx(1.0, rel=0.05)


def test_distinctness_from_stats_refusals(spark):
    from bigdime_spark.operators.stats import distinctness_from_stats

    df = spark.createDataFrame([("p0", "a")], "part string, v string")
    sf = _stats_frame(spark, df, ("v",))
    with pytest.raises(ValueError, match="duplicate rows"):
        distinctness_from_stats(sf.unionByName(sf))
    with pytest.raises(ValueError, match="no rows"):
        distinctness_from_stats(sf.filter(F.lit(False)), table_level=True)
    with pytest.raises(ValueError, match="stat__<col>__hll"):
        distinctness_from_stats(sf.drop("stat__v__hll"))
    with pytest.raises(ValueError, match="stat__<col>__hll"):
        distinctness_from_stats(sf.drop("stat__v__nulls"))


def test_distinctness_bound_in_suite(spark):
    """DistinctnessBound verdicts: a perfect-key part PASSes lo=0.9,
    a part where half the rows repeat one value FAILs, an all-null
    part is NOT_READY (undefined ratio is a part to look at, not a
    pass)."""
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.schema import FAIL, NOT_READY, PASS

    rows = (
        [("p0", f"i{k}", f"u{k}") for k in range(6)]  # unique
        + [("p1", f"j{k}", "hot") for k in range(5)]  # one hot value
        + [("p1", "j9", "solo")]
        + [("p2", f"k{k}", None) for k in range(3)]  # all null
    )
    df = spark.createDataFrame(rows, "part string, image_id string, u string")
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
        extra_table_constraints=[DistinctnessBound("u", lo=0.9, hi=1.0)],
    )
    res = suite.run(spark, df, run_id="dv-bound")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "distinctness.u"
        ).collect()
    }
    assert v == {"p0": PASS, "p1": FAIL, "p2": NOT_READY}
    res.release()


def test_distinctness_bound_metric_selection(spark):
    """metric='uniqueness' judges the singleton-row fraction, not the
    value-set ratio — the two disagree exactly when a value goes hot."""
    df = spark.createDataFrame(
        [("p0", v) for v in ("hot",) * 8 + ("a", "b")],
        "part string, v string",
    )
    prof = distinct_value_profile(df, ("v",)).collect()[0]
    assert prof["distinctness"] == pytest.approx(3 / 10)
    assert prof["uniqueness"] == pytest.approx(2 / 10)

    with pytest.raises(ValueError, match="metric"):
        DistinctnessBound("v", metric="entropy")


def test_distinctness_config_section(spark):
    from bigdime_spark.plans.config import suite_from_config

    suite = suite_from_config(
        {
            "distinctness_bounds": [
                {"column": "image_id", "lo": 1.0},
                {"column": "fmt", "hi": 0.01, "metric": "uniqueness"},
            ]
        }
    )
    a, b = suite.extra_table_constraints
    assert isinstance(a, DistinctnessBound) and a.name == "distinctness.image_id"
    assert (a.lo, a.hi, a.metric) == (1.0, 1.0, "distinctness")
    assert (b.lo, b.hi, b.metric) == (0.0, 0.01, "uniqueness")

    with pytest.raises(ValueError, match="metric must be one of"):
        suite_from_config(
            {"distinctness_bounds": [{"column": "x", "metric": "entropy"}]}
        )
    with pytest.raises(ValueError, match="must be an array"):
        suite_from_config({"distinctness_bounds": {"column": "x"}})
