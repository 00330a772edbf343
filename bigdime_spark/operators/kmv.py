"""KMV (k-minimum-values / bottom-k theta) distinct sketches with set
OVERLAP estimation — the mergeable-sketch capability HLL cannot give.

B6's HyperLogLog answers "how many distinct" and merges by max, but
two HLLs cannot be INTERSECTED; the validation questions that need
intersection — "what fraction of raw image_ids survived into
curated?", "how much does this run's key set overlap last week's?" —
otherwise require an exact join of both key sets (fine once,
impossible as a standing cross-run check at 10^12 keys). A KMV
sketch (Bar-Yossef et al. 2002; the bottom-k/theta-sketch family of
Dasgupta et al. / Apache DataSketches) is a uniform hash sample of
the DISTINCT values: the k smallest hash values. Because the k-min
of a union is computable from the k-mins of the parts, sketches
persist per run/snapshot and union/intersection/Jaccard are
estimated later from two kilobyte-sized rows — zero rescans, the
same persisted-state discipline as C18's cross-run drift.

Determinism and oracle: the hash is the sampling convention's
``conv(substr(md5(value ':' seed), 1, 12), 16, 10)`` — a 48-bit
integer, bit-identical in DuckDB via the strpos digit expansion, so
sketches AND every estimate derived from them are value-exact
replayable in ANSI SQL (no RNG, no engine-dependent hash).

Estimators (standard KMV):
- distinct:  n̂ = (k−1) · SPACE / h_(k)  when the sketch is full,
  the exact kept count when the column had < k distinct values
  (the sketch then IS the distinct hash set);
- union:     the k smallest of the merged hash sets is exactly the
  union's KMV sketch → same estimator;
- Jaccard:   ρ = |{h ∈ K(A∪B) : h ∈ K(A) ∧ h ∈ K(B)}| / |K(A∪B)|
  is an unbiased Jaccard estimate (the union sketch is a uniform
  distinct-sample of A∪B, membership in both sketches ⇔ membership
  in A∩B for sampled values);
- intersection: n̂_∩ = ρ · n̂_∪.

Scale shape: the ONLY shuffle carries DISTINCT 48-bit hashes
(map-side partial distinct first), then the k-min is a top-k
(TakeOrderedAndProject: per-partition heap + driver merge of k
rows) — never a global sort; the sketch row is bounded (k longs) by
construction. Comparison is a crossJoin of two ONE-row frames —
pure Column array arithmetic, no data motion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hex chars of the md5 digest used (48-bit space): wide enough that
#: the k smallest hashes of 10^12 distinct values collide with
#: negligible probability, narrow enough that the DuckDB digit
#: expansion stays in exact BIGINT arithmetic.
KMV_HEX_CHARS = 12
KMV_SPACE = 16 ** KMV_HEX_CHARS  # 2^48


def kmv_hash(col: Column, seed: str = "kmv") -> Column:
    """Uniform 48-bit integer in [0, 2^48) from (value, seed) —
    the sampling convention's md5 truncation, two hex chars wider."""
    rep = F.concat_ws(":", col.cast("string"), F.lit(seed))
    return F.conv(F.substring(F.md5(rep), 1, KMV_HEX_CHARS), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame, col: str, k: int = 256, seed: str = "kmv"
) -> DataFrame:
    """Bottom-k distinct sketch of ``col`` → ONE row
    (k, n_kept, hashes array<long> ascending). NULLs are excluded
    (no identity to count); ``n_kept < k`` means the sketch holds
    EVERY distinct hash and estimates degrade to exact counts."""
    if k < 2:
        raise ValueError(f"kmv_sketch: k must be >= 2, got {k}")
    h = (
        df.where(F.col(col).isNotNull())
        .select(kmv_hash(F.col(col), seed).alias("_h"))
        .distinct()
        .orderBy("_h")
        .limit(k)
    )
    return h.agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sort_array(F.collect_list("_h")).alias("hashes"),
    )


def _distinct_est(k: Column, n_kept: Column, hashes: Column) -> Column:
    """(k−1)·SPACE/h_(k) when full, exact n_kept when not."""
    return F.when(
        n_kept < k, n_kept.cast("double")
    ).otherwise(
        (k - F.lit(1)).cast("double")
        * F.lit(float(KMV_SPACE))
        / F.element_at(hashes, k.cast("int")).cast("double")
    )


def kmv_compare(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Set-overlap estimates from two persisted sketches → ONE row
    (k, n_a_est, n_b_est, union_est, jaccard_est, intersect_est),
    every value a deterministic function of the two hash arrays
    (rounded to 4 decimals; jaccard 6). Sketches may carry different
    ``k`` — the comparison truncates to the smaller (the k-min of a
    union is only valid to the shallower sketch's depth)."""
    a = sketch_a.select(
        F.col("k").alias("_ka"),
        F.col("n_kept").alias("_na"),
        F.col("hashes").alias("_ha"),
    )
    b = sketch_b.select(
        F.col("k").alias("_kb"),
        F.col("n_kept").alias("_nb"),
        F.col("hashes").alias("_hb"),
    )
    j = a.crossJoin(F.broadcast(b))
    return j.select(*_overlap_cols())


def _overlap_cols() -> list[Column]:
    """The estimator arithmetic over prepared (_ka,_na,_ha,_kb,_nb,
    _hb) columns — shared by the single-sketch crossJoin compare and
    the per-part churn join."""
    kk = F.least(F.col("_ka"), F.col("_kb"))
    # the merged bottom-kk IS the union's KMV sketch — but only down
    # to the depth BOTH sides fully cover: a saturated side is blind
    # above its own max hash, so the union sketch must also stop
    # there (standard theta-sketch "theta = min of the two maxima").
    u_all = F.array_sort(F.array_union(F.col("_ha"), F.col("_hb")))
    theta_a = F.when(
        F.col("_na") < F.col("_ka"), F.lit(KMV_SPACE).cast("long")
    ).otherwise(F.element_at(F.col("_ha"), F.col("_ka").cast("int")))
    theta_b = F.when(
        F.col("_nb") < F.col("_kb"), F.lit(KMV_SPACE).cast("long")
    ).otherwise(F.element_at(F.col("_hb"), F.col("_kb").cast("int")))
    theta = F.least(theta_a, theta_b)
    covered = F.filter(u_all, lambda x: x <= theta)
    u = F.when(F.size(covered) > kk.cast("int"), F.slice(covered, 1, kk.cast("int"))).otherwise(
        covered
    )
    usz = F.size(u)
    u_full = usz >= kk.cast("int")
    union_est = F.when(~u_full, usz.cast("double")).otherwise(
        (kk - F.lit(1)).cast("double")
        * F.lit(float(KMV_SPACE))
        / F.element_at(u, usz).cast("double")
    )
    n_inter = F.size(
        F.filter(
            u,
            lambda x: F.array_contains(F.col("_ha"), x)
            & F.array_contains(F.col("_hb"), x),
        )
    )
    rho = F.when(usz > 0, n_inter.cast("double") / usz.cast("double")).otherwise(
        F.lit(0.0)
    )
    return [
        kk.alias("k"),
        F.round(_distinct_est(F.col("_ka"), F.col("_na"), F.col("_ha")), 4).alias(
            "n_a_est"
        ),
        F.round(_distinct_est(F.col("_kb"), F.col("_nb"), F.col("_hb")), 4).alias(
            "n_b_est"
        ),
        F.round(union_est, 4).alias("union_est"),
        F.round(rho, 6).alias("jaccard_est"),
        F.round(rho * union_est, 4).alias("intersect_est"),
    ]


def kmv_overlap(
    df_a: DataFrame,
    col_a: str,
    df_b: DataFrame,
    col_b: str,
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Sketch both sides and compare in one call — the inline form of
    the persist-then-compare cross-run workflow."""
    return kmv_compare(
        kmv_sketch(df_a, col_a, k=k, seed=seed),
        kmv_sketch(df_b, col_b, k=k, seed=seed),
    )


# ------------------------------------------------ per-part / cross-run

def kmv_part_sketches(
    df: DataFrame,
    part_col: str,
    col: str,
    k: int = 256,
    seed: str = "kmv",
    salt_buckets: int = 64,
) -> DataFrame:
    """Per-partition bottom-k sketches → (part, k, n_kept, hashes) —
    the persistable run-stamp for cross-run key-churn (kmv_churn),
    the same zero-rescan discipline as C18's persisted histograms.

    Two-level bottom-k so one giant partition cannot serialize on a
    single sort task: level 1 takes the k smallest per
    (part, hash % salt_buckets) — disjoint value sets, so each
    bucket's bottom-k is a superset of its members of the part-level
    bottom-k (the global answer needs ≤ k values TOTAL, hence ≤ k
    from any one bucket) — level 2 re-ranks the ≤ salt_buckets·k
    survivors per part. Both windows ride the same hash-partitioned
    exchange family as the C27 salted aggregations; the level-1 input
    is the map-side-distinct (part, hash) relation, 8-byte values."""
    if k < 2:
        raise ValueError(f"kmv_part_sketches: k must be >= 2, got {k}")
    d = (
        df.where(F.col(col).isNotNull())
        .select(
            F.col(part_col).alias("part"),
            kmv_hash(F.col(col), seed).alias("_h"),
        )
        .distinct()
    )
    w1 = Window.partitionBy("part", F.col("_h") % salt_buckets).orderBy("_h")
    lvl1 = d.withColumn("_r1", F.row_number().over(w1)).filter(F.col("_r1") <= k)
    w2 = Window.partitionBy("part").orderBy("_h")
    kept = lvl1.withColumn("_r2", F.row_number().over(w2)).filter(
        F.col("_r2") <= k
    )
    return kept.groupBy("part").agg(
        F.lit(k).cast("long").alias("k"),
        F.count(F.lit(1)).alias("n_kept"),
        F.sort_array(F.collect_list("_h")).alias("hashes"),
    )


def kmv_churn(
    prev: DataFrame, cur: DataFrame, join_cols: tuple[str, ...] = ("part",)
) -> DataFrame:
    """Per-part key-set churn between two persisted sketch frames →
    (*join_cols, k, n_prev_est, n_cur_est, union_est, jaccard_est,
    intersect_est, new_est, lost_est). FULL OUTER on ``join_cols``: a
    part present in only one run still reports (its other side is the
    empty sketch — estimates 0, churn = everything). ``new_est`` =
    keys in cur but not prev, ``lost_est`` the reverse, both clamped
    at 0 (the estimators are independently noisy)."""
    jc = list(join_cols)
    p = prev.select(
        *jc,
        F.col("k").alias("_pka"),
        F.col("n_kept").alias("_pna"),
        F.col("hashes").alias("_pha"),
    )
    c = cur.select(
        *jc,
        F.col("k").alias("_pkb"),
        F.col("n_kept").alias("_pnb"),
        F.col("hashes").alias("_phb"),
    )
    j = p.join(c, jc, "full_outer").select(
        *jc,
        F.coalesce(F.col("_pka"), F.col("_pkb")).alias("_ka"),
        F.coalesce(F.col("_pna"), F.lit(0)).alias("_na"),
        F.coalesce(F.col("_pha"), F.array().cast("array<long>")).alias("_ha"),
        F.coalesce(F.col("_pkb"), F.col("_pka")).alias("_kb"),
        F.coalesce(F.col("_pnb"), F.lit(0)).alias("_nb"),
        F.coalesce(F.col("_phb"), F.array().cast("array<long>")).alias("_hb"),
    )
    out = j.select(*jc, *_overlap_cols())
    return out.select(
        *jc,
        "k",
        F.col("n_a_est").alias("n_prev_est"),
        F.col("n_b_est").alias("n_cur_est"),
        "union_est",
        "jaccard_est",
        "intersect_est",
        F.round(
            F.greatest(F.lit(0.0), F.col("n_b_est") - F.col("intersect_est")), 4
        ).alias("new_est"),
        F.round(
            F.greatest(F.lit(0.0), F.col("n_a_est") - F.col("intersect_est")), 4
        ).alias("lost_est"),
    )


def kmv_stamp(
    df: DataFrame,
    part_col: str,
    cols: tuple[str, ...],
    k: int = 256,
    seed: str = "kmv",
) -> DataFrame:
    """Multi-column per-part sketch frame for persistence →
    (column, part, k, n_kept, hashes) — the run-stamp shape the CLI
    writes (run_id added by the caller) so many runs' frames union
    into the `history --kmv` churn input."""
    if not cols:
        raise ValueError("kmv_stamp: cols must be non-empty")
    out = None
    for c in cols:
        sk = kmv_part_sketches(df, part_col, c, k=k, seed=seed).select(
            F.lit(c).alias("column"), "part", "k", "n_kept", "hashes"
        )
        out = sk if out is None else out.unionByName(sk)
    return out


def kmv_run_churn(stamped: DataFrame) -> DataFrame:
    """Latest-vs-previous key churn from an accumulated run_id-stamped
    sketch table (union of many runs' `<out>/kmv`) → kmv_churn rows
    per (column, part). Runs are ordered by run_id ascending — the
    same convention as the trend/history families; needs ≥ 2 runs.
    The run-id listing is a bounded collect (#runs rows)."""
    runs = sorted(
        r["run_id"] for r in stamped.select("run_id").distinct().collect()
    )
    if len(runs) < 2:
        raise ValueError(
            f"kmv_run_churn: needs >= 2 runs, found {len(runs)}"
        )
    prev = stamped.filter(F.col("run_id") == runs[-2]).drop("run_id")
    cur = stamped.filter(F.col("run_id") == runs[-1]).drop("run_id")
    return kmv_churn(prev, cur, join_cols=("column", "part"))
