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
    """Deterministic salt in [0, buckets) from row content.

    MUST be fed per-row-varying columns (a row id, the event id) —
    salting by the grouping key itself is a no-op: det_salt(key) is
    constant within a key group, so the hot key still lands on one
    reducer."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets)).cast("int")


def _salt_col(salt_cols: tuple[str, ...] | None, buckets: int) -> Column:
    """Row-content salt when unique-ish columns are known; otherwise
    the physical input split id (``spark_partition_id``), which varies
    across a hot key's rows by construction. Either way the salt only
    shapes STAGE-1 grouping — the stage-2 fold removes it, so results
    are identical and deterministic regardless of input layout."""
    if salt_cols:
        return det_salt(*salt_cols, buckets=buckets)
    return F.pmod(F.spark_partition_id(), F.lit(buckets)).cast("int")


def salted_stage1(
    df: DataFrame,
    key: str,
    salt_cols: tuple[str, ...] | None,
    aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Stage 1 of the two-level shape: groupBy(key, _salt).agg(...).
    Exposed so tests can assert the physical property directly: a hot
    key MUST fan out over >1 (key, _salt) group."""
    return (
        df.withColumn("_salt", _salt_col(salt_cols, buckets))
        .groupBy(key, "_salt")
        .agg(*aggs)
    )


def salted_count(
    df: DataFrame,
    key: str,
    salt_cols: tuple[str, ...] | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-level count per ``key`` that survives a hot key.
    → (key, n). Identical result to ``groupBy(key).count()``; the
    difference is purely physical — stage 1 spreads a hot key over
    ``buckets`` reducers."""
    stage1 = salted_stage1(df, key, salt_cols, [F.count(F.lit(1)).alias("_c")], buckets)
    return stage1.groupBy(key).agg(F.sum("_c").alias("n"))


def salted_agg(
    df: DataFrame,
    key: str,
    salt_cols: tuple[str, ...] | None,
    partials: list[tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """General two-level aggregation: ``partials`` is a list of
    (stage1_agg_expr_aliased, stage2_fold_expr_aliased) pairs whose
    stage-2 fold combines the salted partials (sum/min/max/bit_xor —
    any commutative reducer)."""
    stage1 = salted_stage1(df, key, salt_cols, [p for p, _ in partials], buckets)
    return stage1.groupBy(key).agg(*[f for _, f in partials])


def cms_sketch_per_part(
    df: DataFrame,
    col: str,
    part_col: str = "part",
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """B10 heavy-hitter sketch: one mergeable count-min sketch per
    partition (``F.count_min_sketch`` — JVM-side aggregation, bytes
    per part, like the HLL sketches in stats.py). → (part, cms)."""
    return df.groupBy(part_col).agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    )


def cms_estimate(spark, sketch_rows: list, items: list) -> dict:
    """Merge per-part CMS sketches driver-side (sketches are KBs; the
    merge is metadata-sized, mirroring the HLL roll-up) and estimate
    the count of each candidate item. Estimates overcount by at most
    eps·N with the sketch's confidence — never undercount.
    → {item: estimated_count}."""
    jvm = spark._jvm
    merged = None
    for row in sketch_rows:
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(row["cms"]))
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    if merged is None:
        return {}
    return {item: merged.estimateCount(item) for item in items}


def hot_keys(
    df: DataFrame,
    key: str,
    threshold_ratio: float = 0.01,
    salt_cols: tuple[str, ...] | None = None,
    buckets: int = 32,
) -> DataFrame:
    """Heavy-hitter detection for the skew report: keys holding more
    than ``threshold_ratio`` of all rows. One salted count — salted on
    ``salt_cols`` if given, else on the physical split id, NEVER on
    ``key`` itself (that salt would be constant per key and the hot
    key would funnel onto one reducer — the skew this function exists
    to measure). Total via window-free cross-join of a 1-row
    aggregate. → (key, n, ratio)."""
    counts = salted_count(df, key, salt_cols, buckets=buckets)
    total = counts.agg(F.sum("n").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("ratio", F.col("n") / F.col("_total"))
        .filter(F.col("ratio") > threshold_ratio)
        .select(key, "n", F.round("ratio", 6).alias("ratio"))
    )
