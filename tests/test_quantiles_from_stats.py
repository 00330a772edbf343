"""quantiles_from_stats oracles: reconstruction accuracy is bounded
by one bucket width, the table-level roll-up is value-identical to an
unpartitioned profile, and the drift refusal guards carry over.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.stats import histogram_frames, quantiles_from_stats

SPEC = [("x", 0.0, 1000.0, 50)]  # bucket width 20


@pytest.fixture(scope="module")
def stats_frame(spark):
    # deterministic, uniform-ish: x = (7919·i mod 1000) over 4 parts
    df = (
        spark.range(4000)
        .select(
            F.concat(F.lit("p"), (F.col("id") % 4).cast("string")).alias("part"),
            ((F.col("id") * 7919) % 1000).cast("double").alias("x"),
        )
    )
    return df, histogram_frames(df, SPEC)


def test_estimates_within_one_bucket_width(spark, stats_frame):
    df, sf = stats_frame
    est = {
        (r["part"], r["q"]): r["quantile_est"]
        for r in quantiles_from_stats(sf).collect()
    }
    exact = {
        r["part"]: r["p"]
        for r in df.groupBy("part")
        .agg(F.expr("percentile(x, array(0.25, 0.5, 0.75))").alias("p"))
        .collect()
    }
    width = 20.0
    for part, ps in exact.items():
        for q, e in zip((0.25, 0.5, 0.75), ps):
            assert abs(est[(part, q)] - e) <= width, (part, q, est[(part, q)], e)


def test_table_level_equals_unpartitioned_profile(spark, stats_frame):
    df, sf = stats_frame
    rolled = {
        r["q"]: r["quantile_est"]
        for r in quantiles_from_stats(sf, table_level=True).collect()
    }
    direct_sf = histogram_frames(df.withColumn("part", F.lit("*")), SPEC)
    direct = {
        r["q"]: r["quantile_est"]
        for r in quantiles_from_stats(direct_sf).collect()
    }
    assert rolled == direct  # bucket counts are additive → exact equality


def test_n_rows_exact_and_clamps(spark):
    # all mass below lo → underflow bucket → q clamps to lo
    df = spark.range(100).select(
        F.lit("p0").alias("part"), F.lit(-5.0).alias("x")
    )
    sf = histogram_frames(df, SPEC)
    rows = quantiles_from_stats(sf, qs=(0.5,)).collect()
    assert rows[0]["n_rows"] == 100
    assert rows[0]["quantile_est"] == 0.0  # lo clamp


def test_duplicate_part_rows_refused(spark, stats_frame):
    _, sf = stats_frame
    with pytest.raises(ValueError, match="one row per part"):
        quantiles_from_stats(sf.unionByName(sf))


def test_spec_less_frame_refused(spark, stats_frame):
    _, sf = stats_frame
    bare = sf.drop(*[c for c in sf.columns if c.endswith("__hist_spec")])
    with pytest.raises(ValueError, match="hist_spec"):
        quantiles_from_stats(bare)
