"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and a sign-bit LSH
(axis-aligned random-hyperplane family) bucketed variant as the scale
path. Dot products are ``zip_with`` + ``aggregate`` folds — pure
Column expressions evaluated JVM-side, no Python in the hot loop.

Scale posture (10^9+ vectors):
- brute-force is broadcast(queries) × full scan — linear, shuffle-free,
  embarrassingly parallel; right whenever |queries| is small;
- LSH bucketing turns all-pairs similarity into per-bucket joins whose
  cost is Σ bucket² — the standard trade; bucket width is controlled
  by ``nbits`` and hot buckets are AQE-skew-split;
- everything arithmetic is cast to double *before* folding so results
  are deterministic and reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set
    against the full vector table, windowed rank. One scan, one
    shuffle (the per-query top-k). → (query_id, rank, neighbor_id,
    cosine). Ties broken by neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    cand = df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cvec"))
    scored = (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("_qvec"), F.col("_cvec")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def sign_lsh_bucket(vec: Column, nbits: int = 4) -> Column:
    """Axis-aligned sign-bit LSH bucket: bit i = (vec[i] >= 0).
    A true random-hyperplane family would dot against seeded Gaussian
    planes; axis-aligned planes are the deterministic, oracle-portable
    member of the same family (vectors are already a random rotation
    of the data here). → bucket int in [0, 2^nbits)."""
    out = F.lit(0)
    for i in range(nbits):
        out = out + F.when(
            F.element_at(vec, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return out


def lsh_nearest_in_bucket(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 4,
) -> DataFrame:
    """ANN: each vector's nearest neighbor within its LSH bucket.
    Join cost Σ bucket² instead of n²; hot buckets are split by AQE.
    → (vec_id, bucket, neighbor_id, cosine). Vectors alone in their
    bucket produce no row (exactly the ANN recall trade)."""
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        sign_lsh_bucket(F.col(vec_col), nbits).alias("bucket"),
    )
    left = b.select(F.col("id").alias("vec_id"), F.col("v").alias("_v1"), "bucket")
    right = b.select(F.col("id").alias("neighbor_id"), F.col("v").alias("_v2"), "bucket")
    scored = (
        left.join(right, "bucket")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "bucket",
            "neighbor_id",
            F.round(cosine_col(F.col("_v1"), F.col("_v2")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (blocked all-pairs ≥ threshold).
    → (id1, id2, cosine)."""
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("v")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    b = df.select(*cols)
    on = ["blk"] if block_col else []
    left = b.select(*([F.col("blk")] if block_col else []), F.col("id").alias("id1"), F.col("v").alias("_v1"))
    right = b.select(*([F.col("blk")] if block_col else []), F.col("id").alias("id2"), F.col("v").alias("_v2"))
    joined = left.join(right, on) if on else left.crossJoin(right)
    return (
        joined.filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine_col(F.col("_v1"), F.col("_v2")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def similarity_histogram(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    nbins: int = 20,
) -> DataFrame:
    """Distribution of pairwise cosine (within blocks) over fixed
    [-1, 1] bins — the drift-style diagnostic for embedding spaces.
    → (bucket, cnt) with bucket = floor((cos+1)/2 · nbins), clamped."""
    pairs = cosine_dup_pairs(df, id_col, vec_col, block_col, threshold=-2.0)
    bucket = F.least(
        F.lit(nbins - 1),
        F.greatest(F.lit(0), F.floor((F.col("cosine") + 1.0) / 2.0 * nbins).cast("int")),
    )
    return pairs.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
