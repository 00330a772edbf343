"""Cross-run drift from persisted stats histograms (round-3 addition):
drift_from_stats over the stored bucket-count arrays must be
VALUE-IDENTICAL to two_sample_drift_multi over the original rows —
the histogram analogue of the HLL-sketch roll-up, so the old snapshot
never needs rescanning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.drift import (
    DriftColumn,
    drift_from_stats,
    two_sample_drift_multi,
)
from bigdime_spark.operators.stats import ColumnProfile, StatsProfile
from bigdime_spark.sources.synth import build_fixture

SPECS = (DriftColumn("w", 0.0, 256.0, 32), DriftColumn("h", 0.0, 256.0, 32))
PROFILE = StatsProfile(
    columns=[
        ColumnProfile("w", histogram=(0.0, 256.0, 32)),
        ColumnProfile("h", histogram=(0.0, 256.0, 32)),
    ]
)


def _stats_of(df):
    return df.groupBy("part").agg(*PROFILE.agg_exprs())


def _rows(df):
    return {
        (r["part"], r["column"]): (
            round(r["ks_d"], 12) if r["ks_d"] is not None else None,
            round(r["ks_threshold"], 12) if r["ks_threshold"] is not None else None,
            round(r["psi"], 12) if r["psi"] is not None else None,
            r["n"],
            r["m"],
        )
        for r in df.collect()
    }


def test_drift_from_stats_equals_direct_drift(spark):
    # drift_parts shifts w/h on part index 1 → a real drifted part plus
    # undrifted ones; both paths must agree on every number
    fx = build_fixture(spark, n_rows=400, n_parts=4, drift_parts=(1,))
    direct = two_sample_drift_multi(fx.raw, fx.curated, SPECS)
    stored = drift_from_stats(_stats_of(fx.raw), _stats_of(fx.curated))
    assert _rows(stored) == _rows(direct)
    # sanity: the drifted part actually drifts and a clean part doesn't
    d = _rows(direct)
    assert d[("p0001", "w")][0] > d[("p0000", "w")][0]


def test_suite_stats_output_is_drift_ready(spark):
    """The default image profile persists w/h/phash histograms, so two
    ValidationSuite runs' stats outputs feed drift_from_stats as-is."""
    from bigdime_spark.plans.suite import ValidationSuite

    fx = build_fixture(spark, n_rows=200, n_parts=2, drift_parts=(1,))
    suite = ValidationSuite(
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_checksum=False,
        check_record_count=False,
        check_domains=False,
        not_null=(),
    )
    res_a = suite.run(spark, fx.raw, run_id="a")
    res_b = suite.run(spark, fx.curated, run_id="b")
    hist_cols = [c for c in res_a.stats.columns if c.endswith("__hist")]
    assert sorted(hist_cols) == [
        "stat__h__hist", "stat__phash__hist", "stat__w__hist",
    ]
    scores = drift_from_stats(res_a.stats, res_b.stats)
    got = _rows(scores)
    assert set(got) == {
        (p, c) for p in ("p0000", "p0001") for c in ("w", "h", "phash")
    }
    # the drifted part's w distribution drifts; the clean part's doesn't
    assert got[("p0001", "w")][0] > got[("p0000", "w")][0]
    res_a.release()
    res_b.release()


def test_melt_raises_without_histograms(spark):
    df = spark.createDataFrame([("p0", 1)], "part string, stat__w__nulls long")
    with pytest.raises(ValueError, match="no stat__<col>__hist"):
        drift_from_stats(df, df)


def test_mismatched_specs_refused(spark):
    a = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 32))])
    b = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 512.0, 64))])
    fx = build_fixture(spark, n_rows=80, n_parts=2)
    sa = fx.raw.groupBy("part").agg(*a.agg_exprs())
    sb = fx.raw.groupBy("part").agg(*b.agg_exprs())
    with pytest.raises(ValueError, match="histogram spec mismatch for 'w'"):
        drift_from_stats(sa, sb)


def test_spec_mismatch_within_one_frame_refused(spark):
    """A stats table accumulating rows profiled under DIFFERENT specs
    must be refused even when the first row looks consistent (round-4
    ADVICE: the guard used to read only row one)."""
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    p32 = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 32))])
    p16 = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 16))])
    a32 = fx.raw.filter(F.col("part") == "p0000").groupBy("part").agg(*p32.agg_exprs())
    b16 = (
        fx.raw.filter(F.col("part") == "p0001")
        .groupBy("part")
        .agg(*p16.agg_exprs())
        # align array length so the union is legal but the SPEC differs
    )
    mixed = a32.unionByName(b16, allowMissingColumns=True)
    clean = fx.curated.groupBy("part").agg(*p32.agg_exprs())
    with pytest.raises(ValueError, match="varies WITHIN"):
        drift_from_stats(mixed, clean)


def test_duplicate_part_rows_refused(spark):
    """Two stats rows for one part (an accumulated table not filtered
    to a single run) would silently double counts — must be refused."""
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    p32 = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 32))])
    stats = fx.raw.groupBy("part").agg(*p32.agg_exprs())
    doubled = stats.unionByName(stats)
    with pytest.raises(ValueError, match="exactly one"):
        drift_from_stats(doubled, stats)


def test_table_level_rollup_equals_unpartitioned_drift(spark):
    """table_level=True sums the per-part bucket arrays before scoring
    — value-identical to profiling the WHOLE table as one part
    (fixed-bin counts are additive), with part = '*'."""
    fx = build_fixture(spark, n_rows=200, n_parts=4, drift_parts=(2,))
    per_part = drift_from_stats(
        _stats_of(fx.raw), _stats_of(fx.curated), table_level=True
    )
    one_part = drift_from_stats(
        _stats_of(fx.raw.withColumn("part", F.lit("*"))),
        _stats_of(fx.curated.withColumn("part", F.lit("*"))),
    )
    got, want = _rows(per_part), _rows(one_part)
    assert set(got) == set(want) and got == want
    assert all(p == "*" for p, _ in got)


def test_table_level_refuses_mixed_bins_in_specless_frame(spark):
    """A spec-less stats frame (pre-spec-persistence era) whose parts
    were profiled with different nbins must be refused by the rollup —
    summing bucket ids across different bin widths is confidently
    wrong, and no hist_spec column exists to catch it upstream."""
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    p32 = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 32))])
    p64 = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 64))])
    a = fx.raw.filter(F.col("part") == "p0000").groupBy("part").agg(*p32.agg_exprs())
    b = fx.raw.filter(F.col("part") == "p0001").groupBy("part").agg(*p64.agg_exprs())
    mixed = a.unionByName(b).drop("stat__w__hist_spec")
    ok = _stats_of(fx.curated).drop("stat__w__hist_spec", "stat__h__hist")
    with pytest.raises(ValueError, match="different bin counts"):
        drift_from_stats(mixed, ok.select("part", "stat__w__hist"), table_level=True)


def test_null_part_row_is_one_part_not_a_duplicate(spark):
    """A stats frame holding a NULL-part row (groupBy keeps the NULL
    group) is ONE part per row — the fused guard must not refuse it as
    'duplicate rows' just because count_distinct drops NULLs. Two
    NULL-part rows ARE duplicates and must still be refused."""
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    p32 = StatsProfile(columns=[ColumnProfile("w", histogram=(0.0, 256.0, 32))])
    stats = fx.raw.groupBy("part").agg(*p32.agg_exprs())
    with_null = stats.unionByName(
        fx.raw.withColumn("part", F.lit(None).cast("string"))
        .groupBy("part")
        .agg(*p32.agg_exprs())
    )
    other = fx.curated.groupBy("part").agg(*p32.agg_exprs())
    # must NOT raise; NULL part scores like any other part key
    assert drift_from_stats(with_null, other).count() > 0
    doubled_null = with_null.unionByName(with_null.filter(F.col("part").isNull()))
    with pytest.raises(ValueError, match="exactly one"):
        drift_from_stats(doubled_null, other)


# ----------------------------------------------- W1 / JS drift measures


def _ts_drift(spark, vals_a, vals_b, lo=0.0, hi=10.0, nbins=10):
    from bigdime_spark.operators.drift import DriftColumn, two_sample_drift

    a = spark.createDataFrame([(float(v),) for v in vals_a], "x double").withColumn(
        "part", F.lit("*")
    )
    b = spark.createDataFrame([(float(v),) for v in vals_b], "x double").withColumn(
        "part", F.lit("*")
    )
    return two_sample_drift(a, b, DriftColumn("x", lo, hi, nbins)).collect()[0]


def test_w1_js_zero_on_identical(spark):
    vals = [0.5, 1.5, 2.5, 2.5, 7.5]
    r = _ts_drift(spark, vals, vals)
    assert r["w1"] == 0.0 and r["js"] == 0.0 and r["ks_d"] == 0.0


def test_w1_counts_shift_in_bucket_units(spark):
    # mass at bucket(0.5)=1 vs bucket(3.5)=4: one unit of probability
    # moved 3 buckets → W1 = 3; KS only sees sup-norm 1.0 either way
    r = _ts_drift(spark, [0.5], [3.5])
    assert r["w1"] == 3.0 and r["ks_d"] == 1.0


def test_w1_gap_weighting_matches_dense_sum(spark):
    # sparse buckets with a gap: A all at 0.5 (bucket 1), B at 9.5
    # (bucket 10) → ECDF diff 1.0 across 9 bucket positions
    r = _ts_drift(spark, [0.5, 0.5], [9.5, 9.5])
    assert r["w1"] == 9.0


def test_js_bounded_and_maximal_on_disjoint(spark):
    # disjoint supports → JS = 1.0 exactly (log2 base)
    r = _ts_drift(spark, [0.5, 1.5], [7.5, 8.5])
    assert abs(r["js"] - 1.0) < 1e-12
    # overlapping → strictly inside (0, 1)
    r2 = _ts_drift(spark, [0.5, 7.5], [7.5, 8.5])
    assert 0.0 < r2["js"] < 1.0


def test_w1_monotone_under_growing_shift(spark):
    base = [0.5, 1.5, 2.5]
    w1s = [
        _ts_drift(spark, base, [v + d for v in base])["w1"]
        for d in (0.0, 2.0, 4.0)
    ]
    assert w1s[0] < w1s[1] < w1s[2]


# ------------------------------------- categorical drift + profile


def _cat_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "c string").withColumn(
        "part", F.lit("*")
    )


def test_categorical_drift_zero_on_identical(spark):
    from bigdime_spark.operators.drift import categorical_drift

    vals = ["a", "a", "b", "c"]
    r = categorical_drift(_cat_df(spark, vals), _cat_df(spark, vals), ("c",)).collect()[0]
    assert abs(r["psi"]) < 1e-9 and r["js"] == 0.0 and r["chi2"] == 0.0
    assert r["n_cats"] == 3


def test_categorical_drift_new_category_widens_support(spark):
    from bigdime_spark.operators.drift import categorical_drift

    a = _cat_df(spark, ["a", "b", "a", "b"])
    b = _cat_df(spark, ["a", "b", "zz", "zz"])
    r = categorical_drift(a, b, ("c",)).collect()[0]
    assert r["n_cats"] == 3  # union support sees the new value
    assert r["js"] > 0 and r["chi2"] > 0
    # nulls excluded
    bn = _cat_df(spark, ["a", "b", None, None])
    rn = categorical_drift(a, bn, ("c",)).collect()[0]
    assert rn["m"] == 2


def test_categorical_profile_entropy_and_mode(spark):
    from bigdime_spark.operators.stats import categorical_profile

    # uniform over 4 values → entropy = 2 bits exactly
    df = _cat_df(spark, ["a", "b", "c", "d"])
    r = categorical_profile(df, ("c",)).collect()[0]
    assert abs(r["entropy"] - 2.0) < 1e-12
    assert r["n_distinct"] == 4 and r["top_frac"] == 0.25
    # tie on counts → lexicographically smallest value wins (deterministic)
    assert r["top_value"] == "a"
    # collapse → entropy 0, top_frac 1
    r2 = categorical_profile(_cat_df(spark, ["x", "x", "x"]), ("c",)).collect()[0]
    assert r2["entropy"] == 0.0 and r2["top_value"] == "x" and r2["top_frac"] == 1.0


def test_suite_categorical_drift_fmt(spark):
    """categorical_drift_cols=('fmt',): a curated snapshot whose fmt
    mix collapsed to a single value must FAIL drift_cat.fmt in every
    part; an undisturbed pair must PASS (grid-filled)."""
    from bigdime_spark.plans.suite import ValidationSuite
    from bigdime_spark.schema import FAIL, PASS

    fx = build_fixture(spark, n_rows=64 * 4, n_parts=4)
    suite = ValidationSuite(
        check_drift=False,
        check_caption=False,
        check_uniqueness=False,
        check_referential=False,
        check_checksum=False,
        check_record_count=False,
        categorical_drift_cols=("fmt",),
    )
    collapsed = fx.curated.withColumn("fmt", F.lit("png"))
    res = suite.run(spark, fx.raw, collapsed, manifest=None, resume=False)
    got = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(F.col("constraint") == "drift_cat.fmt").collect()
    }
    assert set(got.values()) == {FAIL} and len(got) == 4
    res.release()

    res2 = suite.run(spark, fx.raw, fx.curated, manifest=None, resume=False)
    got2 = {
        r["part"]: r["verdict"]
        for r in res2.verdicts.filter(F.col("constraint") == "drift_cat.fmt").collect()
    }
    assert set(got2.values()) == {PASS} and len(got2) == 4
    res2.release()


def test_embedding_drift_detects_shift(spark):
    from bigdime_spark.operators.drift import embedding_drift

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "part", F.lit("*")
    )
    # identical snapshots → every projection's every measure is zero
    same = embedding_drift(e, e, dim=64, nproj=4, seed=7).collect()
    assert len(same) == 4
    assert all(r["ks_d"] == 0.0 and r["w1"] == 0.0 and r["js"] == 0.0 for r in same)
    # constant shift along dim 0 → the projections move (each plane's
    # component 0 is nonzero w.p. 1), KS flags and W1 grows
    shifted = e.withColumn(
        "embedding",
        F.concat(
            F.array(F.element_at("embedding", 1) + F.lit(2.0)),
            F.slice("embedding", 2, 63),
        ),
    )
    drift = embedding_drift(e, shifted, dim=64, nproj=4, seed=7).collect()
    assert any(r["ks_d"] > r["ks_threshold"] for r in drift)
    assert all(r["w1"] > 0 for r in drift)
