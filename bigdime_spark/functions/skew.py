"""Deterministic skew mitigation (SURVEY B27/B28; BASELINE.json:6
"skew from hot phash buckets is handled via salted repartitioning and
AQE skew-join hints").

AQE splits skewed JOIN partitions at runtime (enabled in session.py),
but skewed AGGREGATIONS need the classic two-level salted shape:

    stage 1:  groupBy(key, salt)  — hot key fans out over NS reducers
    stage 2:  groupBy(key)        — NS partial rows fold to one

The salt is a hash, never ``F.rand()`` — determinism under retry and
across parallelism levels is a correctness requirement (SURVEY §5.4):
a task retry that re-draws random salts would double-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def det_salt(*cols: str, buckets: int = 16) -> Column:
    """Deterministic salt in [0, buckets) from row content."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def salted_count(
    df: DataFrame,
    key: str,
    salt_cols: tuple[str, ...],
    buckets: int = 16,
) -> DataFrame:
    """Two-level count per ``key`` that survives a hot key.
    → (key, n). Identical result to ``groupBy(key).count()``; the
    difference is purely physical — stage 1 spreads a hot key over
    ``buckets`` reducers."""
    return (
        df.withColumn("_salt", det_salt(*salt_cols, buckets=buckets))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(key)
        .agg(F.sum("_c").alias("n"))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    salt_cols: tuple[str, ...],
    partials: list[tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """General two-level aggregation: ``partials`` is a list of
    (stage1_agg_expr_aliased, stage2_fold_expr_aliased) pairs whose
    stage-2 fold combines the salted partials (sum/min/max/bit_xor —
    any commutative reducer)."""
    stage1 = (
        df.withColumn("_salt", det_salt(*salt_cols, buckets=buckets))
        .groupBy(key, "_salt")
        .agg(*[p for p, _ in partials])
    )
    return stage1.groupBy(key).agg(*[f for _, f in partials])


def hot_keys(df: DataFrame, key: str, threshold_ratio: float = 0.01) -> DataFrame:
    """Heavy-hitter detection for the skew report: keys holding more
    than ``threshold_ratio`` of all rows. One salted count (this
    function must itself survive the skew it measures) plus a scalar
    total via window-free cross-join of a 1-row aggregate.
    → (key, n, ratio)."""
    counts = salted_count(df, key, (key,), buckets=32)
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("ratio", F.col("n") / F.col("_total"))
        .filter(F.col("ratio") > threshold_ratio)
        .select(key, "n", F.round("ratio", 6).alias("ratio"))
    )
