"""Zone-map overlap / clustering-depth oracles (operators/layout):
planted clustered-vs-scattered structure, a brute-force property check
on seeded random ranges, the persisted-stats form, refusal contracts,
and the no-single-partition plan shape.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators import layout


def _collect(df):
    return {r["part"]: r for r in df.collect()}


def test_clustered_vs_scattered_depths(spark):
    rows = [
        ("a", 0, 9),          # disjoint block: overlaps self + wide
        ("b", 10, 19),
        ("c", 20, 29),
        ("wide", 0, 29),      # spans everything
        ("n", None, None),    # NULL range: row kept, depth NULL
    ]
    r = spark.createDataFrame(rows, "part string, mn int, mx int")
    got = _collect(layout.zone_overlap_profile(r))
    assert got["a"]["overlap_depth"] == 2
    assert got["b"]["overlap_depth"] == 2
    assert got["c"]["overlap_depth"] == 2
    assert got["wide"]["overlap_depth"] == 4
    assert got["wide"]["overlap_fraction"] == 1.0
    assert got["n"]["overlap_depth"] is None
    assert got["n"]["overlap_fraction"] is None
    assert all(r["n_parts"] == 4 for r in got.values())


def test_touching_boundaries_overlap(spark):
    # closed intervals: sharing one endpoint IS an overlap
    rows = [("a", 0, 10), ("b", 10, 20)]
    r = spark.createDataFrame(rows, "part string, mn int, mx int")
    got = _collect(layout.zone_overlap_profile(r))
    assert got["a"]["overlap_depth"] == 2
    assert got["b"]["overlap_depth"] == 2


def test_identical_point_ranges_span_zero(spark):
    # all ranges are the same single point: span-0 bucketing path
    rows = [(f"p{i}", 7, 7) for i in range(5)]
    r = spark.createDataFrame(rows, "part string, mn int, mx int")
    got = _collect(layout.zone_overlap_profile(r))
    assert all(v["overlap_depth"] == 5 for v in got.values())


def test_matches_bruteforce_on_seeded_random_ranges(spark):
    rng = random.Random(20260818)
    rows = []
    for i in range(120):
        a, b = rng.randint(0, 500), rng.randint(0, 500)
        rows.append((f"p{i}", min(a, b), max(a, b)))
    r = spark.createDataFrame(rows, "part string, mn int, mx int")
    got = {
        p: d["overlap_depth"] for p, d in _collect(layout.zone_overlap_profile(r)).items()
    }
    exp = {
        p: sum(1 for (_, m2, x2) in rows if m2 <= x and x2 >= m)
        for (p, m, x) in rows
    }
    assert got == exp


def test_from_stats_equals_direct(spark):
    df = spark.createDataFrame(
        [(p, v) for p in ("p0", "p1", "p2") for v in range(10)],
        "part string, x int",
    ).withColumn("x", F.col("x") + F.when(F.col("part") == "p2", 100).otherwise(0))
    ranges = layout.zone_ranges(df, "x")
    direct = _collect(layout.zone_overlap_profile(ranges))
    stats = ranges.select(
        "part",
        F.col("mn").alias("stat__x__min"),
        F.col("mx").alias("stat__x__max"),
    )
    via_stats = _collect(layout.zone_overlap_from_stats(stats, "x"))
    assert {p: r["overlap_depth"] for p, r in direct.items()} == {
        p: r["overlap_depth"] for p, r in via_stats.items()
    }
    # p0/p1 share 0..9 (depth 2); p2 sits at 100..109 alone (depth 1)
    assert direct["p2"]["overlap_depth"] == 1


def test_from_stats_missing_column_raises(spark):
    stats = spark.createDataFrame([("p0", 1)], "part string, stat__x__min int")
    with pytest.raises(ValueError, match="stat__x__max"):
        layout.zone_overlap_from_stats(stats, "x")


def test_duplicate_part_rows_refused(spark):
    r = spark.createDataFrame(
        [("p0", 0, 1), ("p0", 2, 3)], "part string, mn int, mx int"
    )
    with pytest.raises(ValueError, match="duplicate part rows"):
        layout.zone_overlap_profile(r)


def test_half_null_range_refused(spark):
    r = spark.createDataFrame([("p0", 0, None)], "part string, mn int, mx int")
    with pytest.raises(ValueError, match="one of \\(mn, mx\\) NULL"):
        layout.zone_overlap_profile(r)


def test_inverted_range_refused(spark):
    r = spark.createDataFrame([("p0", 9, 1)], "part string, mn int, mx int")
    with pytest.raises(ValueError, match="mn > mx"):
        layout.zone_overlap_profile(r)


def test_nan_range_endpoint_refused(spark):
    # NaN is unordered: depth over a NaN endpoint is undefined, and the
    # mn > mx / half-NULL guards can't see it (NaN comparisons are
    # false, NaN is not NULL) — it must be refused explicitly.
    rows = [("a", 0.0, 10.0), ("b", 20.0, float("nan")), ("c", 100.0, 110.0)]
    r = spark.createDataFrame(rows, "part string, mn double, mx double")
    with pytest.raises(ValueError, match="NaN"):
        layout.zone_overlap_profile(r)


def test_bigint_past_double_precision_exact(spark):
    # adjacent snowflake-scale int64 ranges collapse to one double
    # (ULP at 1.8e18 is 256); disjoint ranges must stay depth 1 —
    # ordering inside _rank_counts has to use the original type.
    base = 1_800_000_000_000_000_000
    rows = [
        ("a", base, base + 40),
        ("b", base + 41, base + 90),   # disjoint from a by 1 long
        ("c", base + 91, base + 130),  # disjoint from b by 1 long
    ]
    r = spark.createDataFrame(rows, "part string, mn bigint, mx bigint")
    got = _collect(layout.zone_overlap_profile(r))
    assert {p: v["overlap_depth"] for p, v in got.items()} == {
        "a": 1, "b": 1, "c": 1,
    }


def test_empty_frame_returns_empty(spark):
    r = spark.createDataFrame([], "part string, mn int, mx int")
    out = layout.zone_overlap_profile(r)
    assert out.count() == 0
    assert out.columns == [
        "part", "mn", "mx", "n_parts", "overlap_depth", "overlap_fraction",
    ]


def test_plan_no_single_partition_window(spark):
    """The searchsorted cumulative counts run in windows PARTITIONED
    BY the value bucket — a parts-sized frame must never force a
    single global partition (the shard_pack discipline)."""
    rows = [(f"p{i}", i * 10, i * 10 + 25) for i in range(40)]
    r = spark.createDataFrame(rows, "part string, mn int, mx int")
    out = layout.zone_overlap_profile(r)
    plan = out._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        out._jdf.queryExecution(), "formatted"
    )
    assert "SinglePartition" not in plan


# ------------------------------------------------- suite integration


def test_zone_clustering_suite_gate(spark):
    """ZoneClustering rides the fused stats: a part-clustered w column
    grid-fills PASS, an all-null part surfaces NOT_READY, and the
    fixture's naturally scattered w FAILs every part at the 0.5
    bound."""
    from bigdime_spark.plans.suite import ValidationSuite
    from bigdime_spark.schema import FAIL, NOT_READY, PASS
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=160, n_parts=4)

    # clustered: one disjoint point-range per part, except p0000 whose
    # w is all NULL (unknowable range -> NOT_READY)
    clustered = fx.raw.withColumn(
        "w",
        F.when(F.col("part") == "p0000", F.lit(None).cast("int")).otherwise(
            F.substring("part", 2, 4).cast("int") * 100 + 5
        ),
    )
    suite = ValidationSuite(
        check_drift=False, zone_clustering_cols=("w",), zone_max_overlap=0.5
    )
    res = suite.run(spark, clustered, fx.curated, manifest=None, resume=False)
    got = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "zone_clustering.w"
        ).collect()
    }
    res.release()
    assert got["p0000"] == NOT_READY
    assert {got[p] for p in ("p0001", "p0002", "p0003")} == {PASS}

    # scattered: synth w is random per part -> every range overlaps
    # every other -> fraction 1.0 > 0.5 -> all four parts FAIL
    res2 = suite.run(spark, fx.raw, fx.curated, manifest=None, resume=False)
    got2 = {
        r["part"]: r["verdict"]
        for r in res2.verdicts.filter(
            F.col("constraint") == "zone_clustering.w"
        ).collect()
    }
    viol = res2.violations.filter(
        F.col("constraint") == "zone_clustering.w"
    ).collect()
    res2.release()
    assert set(got2.values()) == {FAIL} and len(got2) == 4
    assert len(viol) == 4 and all("depth=4/4" in v["detail"] for v in viol)


def test_zone_clustering_bad_fraction_raises(spark):
    with pytest.raises(ValueError, match="max_fraction"):
        layout.ZoneClustering("w", max_fraction=0.0)
