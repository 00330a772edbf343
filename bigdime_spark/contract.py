"""Driver contract: paired (Spark query, DuckDB oracle SQL) registry.

Each entry exercises one operator family from SURVEY.md §2 against the
driver's TPC-H-ish corpus (TESTDATA.md). The Spark side and the SQL
side are written as the SAME arithmetic, expression by expression —
floats are rounded identically on both sides and hash-sensitive
expressions use md5 (bit-identical across engines) instead of
xxhash64 — so the driver's row-count + schema + value-hash comparison
is exact, not approximate.

Entries without SQL (`sql=None`) are the genuinely non-portable ones
(HLL sketch estimates, xxhash64 checksums, Arrow decode) and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdime_spark.functions.text import (
    BPE_ISH_PATTERN,
    ENGLISH_STOPWORDS,
    LANG_MARKERS,
    PUNCT_CLASS,
    bpe_ish_token_count,
    fingerprint_col,
    lang_scores,
    predicted_lang,
    quality_metrics,
    rolling_hash_col,
    ws_token_count,
)
from bigdime_spark.operators import dedup, similarity
from bigdime_spark.operators.drift import DriftColumn, two_sample_drift
from bigdime_spark.operators.record_count import RecordCount
from bigdime_spark.operators.row_checks import DomainCheck, TypeConformance
from bigdime_spark.operators.stats import ColumnProfile, StatsProfile
from bigdime_spark.plans.suite import ValidationSuite

HEX = "0123456789abcdef"
SF_SMOKE = "/root/testdata/sf0.001"


#: memo of the _t split-count probe per (sf_dir, table, parallelism):
#: `df.rdd.getNumPartitions()` converts the scan plan to an RDD through
#: py4j on EVERY call (~0.1-0.4 s), yet its answer is a pure function
#: of the parquet file layout and the session parallelism — a plan-
#: construction decision, not data or results. Memoizing it removes
#: that overhead from every query build (the bench battery calls _t
#: ~300 times per run). Never caches query results.
_T_NEEDS_SPREAD: dict[tuple[str, str, int], bool] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Scale-adaptive input parallelism (guide §2.5 input skew): a
    # small-SF table is one parquet row-group → ONE scan task, which
    # serializes every CPU-heavy map stage behind it (tokenize+md5
    # shingling, PQ encode, regex profiles) onto a single core of 32.
    # Round-robin repartition to the core count when the scan has
    # fewer splits than half the cores; with production inputs the
    # scan already has ≥cores splits and no shuffle is inserted.
    # Every query is placement-invariant by design (SURVEY §5.4), so
    # results are bit-identical either way.
    target = spark.sparkContext.defaultParallelism
    key = (sf_dir, name, target)
    needs = _T_NEEDS_SPREAD.get(key)
    if needs is None:
        needs = df.rdd.getNumPartitions() < max(2, target // 2)
        _T_NEEDS_SPREAD[key] = needs
    if needs:
        df = df.repartition(target)
    return df


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None


# =====================================================================
# §2.2 per-column statistics (fused single-pass aggregations)
# =====================================================================

def q_stats_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("l_quantity").isNull()).alias("null_qty"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
            F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt_price"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
        )
    )


# B4 moment portability: Spark's skewness/kurtosis are the POPULATION
# g1 / excess-g2; DuckDB's `skewness` is the bias-corrected SAMPLE G1
# (kurtosis_pop matches directly), so the oracle de-corrects:
# g1 = G1 · (n−2)/√(n(n−1)). Verified equal to 1e-13 this session.
SQL_STATS_PROFILE = """
SELECT l_returnflag AS part,
       count(*) AS n_rows,
       count(*) - count(l_quantity) AS null_qty,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(sum(l_quantity), 2) AS sum_qty,
       round(skewness(l_extendedprice)
             * (count(l_extendedprice) - 2)
             / sqrt(count(l_extendedprice)::DOUBLE * (count(l_extendedprice) - 1)), 4) AS skew_price,
       round(kurtosis_pop(l_extendedprice), 4) AS kurt_price,
       count(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY 1
"""


def q_minmax_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.stddev("o_totalprice"), 4).alias("stddev_price"),
        F.countDistinct("o_custkey").alias("distinct_cust"),
    )


SQL_MINMAX_ORDERS = """
SELECT count(*) AS n_rows,
       round(min(o_totalprice), 2) AS min_price,
       round(max(o_totalprice), 2) AS max_price,
       round(avg(o_totalprice), 4) AS avg_price,
       round(stddev_samp(o_totalprice), 4) AS stddev_price,
       count(DISTINCT o_custkey) AS distinct_cust
FROM orders
"""


def q_quantiles_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 — ONE array-percentile aggregate, not three scalar ones:
    exact percentile buffers every group value, so three separate aggs
    hold three copies of the buffer (measured 4.3 s → 1.6 s at sf0.1).
    Spark F.percentile(array) == DuckDB quantile_cont per element
    (both linear interpolation)."""
    li = _t(spark, sf_dir, "lineitem")
    qs = F.percentile(
        "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    )
    return (
        li.groupBy(F.col("l_returnflag").alias("part"))
        .agg(qs.alias("_qs"))
        .select(
            "part",
            F.round(F.col("_qs")[0], 4).alias("p25"),
            F.round(F.col("_qs")[1], 4).alias("p50"),
            F.round(F.col("_qs")[2], 4).alias("p75"),
        )
    )


SQL_QUANTILES = """
SELECT l_returnflag AS part,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
FROM lineitem GROUP BY 1
"""


def q_null_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col("value").isNull()).alias("null_value"),
            F.count_if(F.col("props").isNull()).alias("null_props"),
            F.round(
                F.try_divide(
                    F.count_if(F.col("value").isNull()).cast("double"),
                    F.count(F.lit(1)).cast("double"),
                ),
                6,
            ).alias("null_rate_value"),
        )
    )


SQL_NULL_RATE = """
SELECT event_type AS part,
       count(*) AS n_rows,
       count(*) - count(value) AS null_value,
       count(*) - count(props) AS null_props,
       round(((count(*) - count(value))::DOUBLE) / (count(*)::DOUBLE), 6) AS null_rate_value
FROM events GROUP BY 1
"""


def q_dup_parts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-write screen (plans/lineage.duplicate_parts): partitions
    whose per-part metric vectors are identical. The per-priority
    (rows, rounded sum) metrics are naturally all-distinct; one
    '1-URGENT' row re-landed under a '-restated' label plants exactly
    one duplicate group, so the query proves both directions: the
    plant is flagged, the other four stay silent. round(,2) pins the
    float sum so the group-by key is engine-portable."""
    from bigdime_spark.plans.lineage import duplicate_parts

    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.col("o_orderpriority").alias("part")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )
    restated = m.filter(F.col("part") == "1-URGENT").select(
        F.concat(F.col("part"), F.lit("-restated")).alias("part"),
        "n_rows",
        "sum_price",
    )
    return duplicate_parts(m.unionByName(restated))


SQL_DUP_PARTS = """
WITH m AS (
  SELECT o_orderpriority AS part, count(*) AS n_rows,
         round(sum(o_totalprice), 2) AS sum_price
  FROM orders GROUP BY 1
), all_m AS (
  SELECT * FROM m
  UNION ALL
  SELECT part || '-restated', n_rows, sum_price FROM m WHERE part = '1-URGENT'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY n_rows, sum_price ORDER BY part) AS rn
  FROM all_m
)
SELECT count(*) AS n_parts,
       array_to_string(list_sort(list(part) FILTER (rn <= 20)), ',') AS parts_csv,
       n_rows, sum_price
FROM ranked GROUP BY n_rows, sum_price HAVING count(*) >= 2
"""


def q_zone_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map overlap / clustering depth
    (operators/layout.zone_overlap_profile) over a ranges frame with
    DELIBERATE structure: the five o_orderpriority ranges each span
    ~the whole o_orderkey domain (scattered — depth ≈ n_parts), the
    floor(o_orderkey/4000) block ranges are contiguous and disjoint
    (clustered — each overlaps only itself plus the five scattered
    ranges), and one synthetic NULL range keeps the NULL-row
    convention under oracle test. The DuckDB twin states the
    SEMANTICS directly (an all-pairs overlap join — fine at oracle
    scale); the engine computes the same counts via two distributed
    searchsorteds with no pairwise join."""
    from bigdime_spark.operators import layout

    o = _t(spark, sf_dir, "orders")
    pri = o.groupBy(
        F.concat(F.lit("pri:"), F.col("o_orderpriority")).alias("part")
    ).agg(F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx"))
    blk = o.groupBy(
        F.concat(
            F.lit("blk:"),
            F.floor(F.col("o_orderkey") / F.lit(4000)).cast("string"),
        ).alias("part")
    ).agg(F.min("o_orderkey").alias("mn"), F.max("o_orderkey").alias("mx"))
    nul = spark.range(1).select(
        F.lit("null-part").alias("part"),
        F.lit(None).cast("long").alias("mn"),
        F.lit(None).cast("long").alias("mx"),
    )
    return layout.zone_overlap_profile(pri.unionByName(blk).unionByName(nul))


SQL_ZONE_OVERLAP = """
WITH ranges AS (
  SELECT 'pri:' || o_orderpriority AS part,
         min(o_orderkey) AS mn, max(o_orderkey) AS mx
  FROM orders GROUP BY 1
  UNION ALL
  SELECT 'blk:' || CAST(o_orderkey // 4000 AS VARCHAR) AS part,
         min(o_orderkey) AS mn, max(o_orderkey) AS mx
  FROM orders GROUP BY 1
  UNION ALL
  SELECT 'null-part', NULL, NULL
), n AS (
  SELECT count(*) AS np FROM ranges WHERE mn IS NOT NULL
), depths AS (
  SELECT a.part, count(*) AS d
  FROM ranges a JOIN ranges b ON b.mn <= a.mx AND b.mx >= a.mn
  GROUP BY 1
)
SELECT r.part, r.mn, r.mx, n.np AS n_parts,
       d.d AS overlap_depth,
       round(d.d::DOUBLE / n.np, 6) AS overlap_fraction
FROM ranges r CROSS JOIN n LEFT JOIN depths d USING (part)
"""


def q_part_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-run planner input (plans/lineage.part_diff): diff
    two per-part metric snapshots — parts-sized frames, zero data
    rescans. The deterministic priority filters plant one part per
    status: '3-MEDIUM' absent from prev (added), '5-LOW' absent from
    cur (removed), '1-URGENT' thinned by the %7 filter (changed, both
    metrics), the rest unchanged."""
    from bigdime_spark.plans.lineage import part_diff

    o = _t(spark, sf_dir, "orders")

    def summarize(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("o_orderpriority").alias("part")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("o_orderkey").cast("long").alias("keysum"),
        )

    prev = summarize(o.filter(F.col("o_orderpriority") != "3-MEDIUM"))
    cur = summarize(
        o.filter(
            (F.col("o_orderpriority") != "5-LOW")
            & ~(
                (F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_orderkey") % 7 == 0)
            )
        )
    )
    return part_diff(prev, cur)


SQL_PART_DIFF = """
WITH prevs AS (
  SELECT o_orderpriority AS part, count(*) AS n_rows,
         CAST(sum(o_orderkey) AS BIGINT) AS keysum
  FROM orders WHERE o_orderpriority <> '3-MEDIUM' GROUP BY 1
), curs AS (
  SELECT o_orderpriority AS part, count(*) AS n_rows,
         CAST(sum(o_orderkey) AS BIGINT) AS keysum
  FROM orders
  WHERE o_orderpriority <> '5-LOW'
    AND NOT (o_orderpriority = '1-URGENT' AND o_orderkey % 7 = 0)
  GROUP BY 1
)
SELECT coalesce(a.part, b.part) AS part,
       CASE WHEN a.part IS NULL THEN 'added'
            WHEN b.part IS NULL THEN 'removed'
            WHEN a.n_rows IS DISTINCT FROM b.n_rows
              OR a.keysum IS DISTINCT FROM b.keysum THEN 'changed'
            ELSE 'unchanged' END AS status,
       CASE WHEN a.part IS NOT NULL AND b.part IS NOT NULL
             AND (a.n_rows IS DISTINCT FROM b.n_rows
                  OR a.keysum IS DISTINCT FROM b.keysum)
            THEN concat_ws(',',
                 CASE WHEN a.n_rows IS DISTINCT FROM b.n_rows THEN 'n_rows' END,
                 CASE WHEN a.keysum IS DISTINCT FROM b.keysum THEN 'keysum' END)
            END AS changed_cols
FROM prevs a FULL OUTER JOIN curs b ON a.part = b.part
"""


def q_correlation_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural-invariant profile (operators/stats.
    numeric_correlation): per-part Pearson correlation for column
    pairs, all moments fused into ONE hash-agg and melted after the
    reduction. A rescaled/swapped/decoupled column shifts these even
    when every per-column stat passes."""
    from bigdime_spark.operators.stats import numeric_correlation

    li = _t(spark, sf_dir, "lineitem")
    return numeric_correlation(
        li,
        [("l_quantity", "l_extendedprice"), ("l_extendedprice", "l_discount")],
        part_col="l_returnflag",
    )


SQL_CORRELATION = """
WITH base AS (
  SELECT l_returnflag AS part,
         l_quantity::DOUBLE AS q,
         l_extendedprice::DOUBLE AS e,
         l_discount::DOUBLE AS d
  FROM lineitem
)
SELECT part, 'l_quantity~l_extendedprice' AS pair,
       count(CASE WHEN q IS NOT NULL AND e IS NOT NULL THEN 1 END) AS n_pairs,
       round(corr(q, e), 6) AS corr
FROM base GROUP BY 1
UNION ALL
SELECT part, 'l_extendedprice~l_discount' AS pair,
       count(CASE WHEN e IS NOT NULL AND d IS NOT NULL THEN 1 END) AS n_pairs,
       round(corr(e, d), 6) AS corr
FROM base GROUP BY 1
"""


def q_correlation_shift_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot correlation drift (operators/stats.
    correlation_shift): |corr_raw − corr_cur| per (part × pair); the
    deterministic l_orderkey%3 subset plays the curated snapshot. The
    join is between two parts×pairs profile frames — metadata-scale."""
    from bigdime_spark.operators.stats import correlation_shift

    li = _t(spark, sf_dir, "lineitem")
    cur = li.filter(F.col("l_orderkey") % 3 != 0)
    return correlation_shift(
        li, cur, [("l_quantity", "l_extendedprice")], part_col="l_returnflag"
    )


SQL_CORRELATION_SHIFT = """
WITH base AS (
  SELECT l_returnflag AS part, l_orderkey,
         l_quantity::DOUBLE AS q, l_extendedprice::DOUBLE AS e
  FROM lineitem
), a AS (
  SELECT part, 'l_quantity~l_extendedprice' AS pair,
         count(CASE WHEN q IS NOT NULL AND e IS NOT NULL THEN 1 END) AS n_raw,
         round(corr(q, e), 6) AS corr_raw
  FROM base GROUP BY 1
), b AS (
  SELECT part, 'l_quantity~l_extendedprice' AS pair,
         count(CASE WHEN q IS NOT NULL AND e IS NOT NULL THEN 1 END) AS n_cur,
         round(corr(q, e), 6) AS corr_cur
  FROM base WHERE l_orderkey % 3 <> 0 GROUP BY 1
)
SELECT part, pair, n_raw, n_cur, corr_raw, corr_cur,
       round(abs(corr_raw - corr_cur), 6) AS corr_shift
FROM a FULL OUTER JOIN b USING (part, pair)
"""


def q_freshness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/staleness validator (operators/freshness.
    freshness_profile): per event-type max(ts) against an EXPLICIT
    reference instant (never now() — verdicts must be deterministic
    under retry/resume and replayable by the oracle). The 1800 s lag
    budget splits the synthetic types into real PASS and FAIL rows."""
    from bigdime_spark.operators.freshness import freshness_profile

    ev = _t(spark, sf_dir, "events")
    return freshness_profile(
        ev, "ts", by="event_type",
        as_of="2024-01-31 00:00:00", max_lag_seconds=1800,
    )


SQL_FRESHNESS = """
SELECT event_type,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS max_ts,
       epoch('2024-01-31 00:00:00'::TIMESTAMP)::BIGINT
         - floor(epoch(max(ts)))::BIGINT AS lag_seconds,
       CASE WHEN max(ts) IS NULL THEN 'NOT_READY'
            WHEN epoch('2024-01-31 00:00:00'::TIMESTAMP)::BIGINT
                   - floor(epoch(max(ts)))::BIGINT <= 1800 THEN 'PASS'
            ELSE 'FAIL' END AS verdict
FROM events GROUP BY 1
"""


def q_hll_distinct_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 — HLL sketches are engine-specific estimators: rows-only check.

    Reads the table DIRECTLY (no _t adaptive repartition): a
    DataSketches HLL estimate is merge-order sensitive, so the input
    partitioning is pinned to keep the reported estimates stable
    run-over-run (every other query is placement-invariant)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy(F.col("l_returnflag").alias("part"))
        .agg(F.hll_sketch_agg("l_partkey", F.lit(12)).alias("sketch"))
        .select(
            "part",
            F.hll_sketch_estimate("sketch").alias("approx_distinct_parts"),
        )
    )


def q_distinct_partkey_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5/B6 — the value-exact twin of the HLL estimator row: same
    grouping, exact countDistinct, so the distinct family has an
    oracle-checked member beside the tolerance-tested sketch."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("part")).agg(
        F.countDistinct("l_partkey").alias("distinct_parts")
    )


SQL_DISTINCT_EXACT = """
SELECT l_returnflag AS part, count(DISTINCT l_partkey) AS distinct_parts
FROM lineitem GROUP BY 1
"""


# =====================================================================
# §2.3 constraint validators
# =====================================================================

def _lineitem_counts(li: DataFrame) -> DataFrame:
    return li.groupBy(F.col("l_returnflag").alias("part")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def q_record_count_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 RecordCountValidator semantics incl. SKIPPED_CONFIG: the
    manifest is derived with an injected off-by-one on part 'R' and a
    missing entry for part 'N'."""
    counts = _lineitem_counts(_t(spark, sf_dir, "lineitem"))
    manifest = (
        counts.filter(F.col("part") != "N")
        .select(
            "part",
            (
                F.col("n_rows")
                + F.when(F.col("part") == "R", F.lit(1)).otherwise(F.lit(0))
            ).alias("expected_rows"),
        )
    )
    joined = counts.join(F.broadcast(manifest), "part", "left")
    return joined.select(
        "part",
        "n_rows",
        "expected_rows",
        F.when(F.col("expected_rows").isNull(), F.lit("SKIPPED_CONFIG"))
        .when(F.col("n_rows") == F.col("expected_rows"), F.lit("PASS"))
        .otherwise(F.lit("FAIL"))
        .alias("verdict"),
    )


SQL_RECORD_COUNT = """
WITH c AS (SELECT l_returnflag AS part, count(*) AS n_rows FROM lineitem GROUP BY 1),
     m AS (SELECT part, n_rows + CASE WHEN part = 'R' THEN 1 ELSE 0 END AS expected_rows
           FROM c WHERE part <> 'N')
SELECT c.part, c.n_rows, m.expected_rows,
       CASE WHEN m.expected_rows IS NULL THEN 'SKIPPED_CONFIG'
            WHEN c.n_rows = m.expected_rows THEN 'PASS'
            ELSE 'FAIL' END AS verdict
FROM c LEFT JOIN m USING (part)
"""


def q_uniqueness_lineitem_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 — composite key (l_orderkey, l_linenumber) dup groups (clean
    data → empty result is the PASS assertion)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


SQL_UNIQUENESS_LINEITEM = """
SELECT l_orderkey, l_linenumber, count(*) AS n_copies
FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
"""


def q_dup_groups_events_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 non-trivial path: duplicate groups with member counts."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .filter(F.col("n_copies") > 1)
    )


SQL_DUP_GROUPS_EVENTS = """
SELECT user_id, count(*) AS n_copies, count(DISTINCT event_type) AS n_types
FROM events GROUP BY 1 HAVING count(*) > 1
"""


def q_referential_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 — both anti-join directions between lineitem and orders."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lost = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_anti"
    ).agg(F.count(F.lit(1)).alias("orphans")).select(
        F.lit("lineitem_without_order").alias("direction"), "orphans"
    )
    spurious = o.join(
        li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
        "o_orderkey",
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("orphans")).select(
        F.lit("order_without_lineitem").alias("direction"), "orphans"
    )
    return lost.unionByName(spurious)


SQL_REFERENTIAL_COUNTS = """
SELECT 'lineitem_without_order' AS direction, count(*) AS orphans
FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
UNION ALL
SELECT 'order_without_lineitem' AS direction, count(*) AS orphans
FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def q_referential_orphan_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 violation rows: the orphan keys themselves (with lineage cols)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(
            li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
            "o_orderkey",
            "left_anti",
        )
        .select("o_orderkey", "o_orderstatus", F.round("o_totalprice", 2).alias("o_totalprice"))
    )


SQL_REFERENTIAL_ORPHANS = """
SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
FROM orders WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


_BLOOM_M, _BLOOM_K, _BLOOM_SEED = 4096, 3, "refbloom"


def q_referential_bloom_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 via the Bloom membership sketch (operators/bloom): screen
    every customer against a bitmap of orders.o_custkey — the
    shuffle-free referential direction. m is deliberately undersized
    (4096 bits) so the oracle must reproduce the EXACT false-positive
    pattern, not just the definite misses: the md5 positions, the
    32-bit lane fold, and the k-way probe are replayed digit by digit
    in DuckDB."""
    from bigdime_spark.operators.bloom import build_bloom, probe_bloom

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    bl = build_bloom(o, "o_custkey", _BLOOM_M, _BLOOM_K, _BLOOM_SEED)
    return probe_bloom(
        c.select("c_custkey"), bl, "c_custkey", _BLOOM_M, _BLOOM_K, _BLOOM_SEED
    ).select("c_custkey", "bloom_member")


def _bloom_sql(m: int, k: int, seed: str) -> str:
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (9 - i)}::BIGINT"
        for i in range(10)
    )
    return f"""
WITH bpos AS (
  SELECT ({digits}) % {m} AS pos FROM (
    SELECT md5(concat_ws(':', o_custkey::VARCHAR, i::VARCHAR, '{seed}')) AS h
    FROM orders CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i)
  )
), bitmap AS (
  SELECT pos // 32 AS lane, bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
  FROM bpos GROUP BY 1
), ppos AS (
  SELECT c_custkey, ({digits}) % {m} AS pos FROM (
    SELECT c_custkey,
           md5(concat_ws(':', c_custkey::VARCHAR, i::VARCHAR, '{seed}')) AS h
    FROM customer CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS i)
  )
)
SELECT c_custkey,
       bool_and(((coalesce(bits, 0) >> CAST(pos % 32 AS INT)) & 1) = 1) AS bloom_member
FROM ppos LEFT JOIN bitmap ON ppos.pos // 32 = bitmap.lane
GROUP BY 1
"""


SQL_REFERENTIAL_BLOOM = _bloom_sql(_BLOOM_M, _BLOOM_K, _BLOOM_SEED)


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift (round-5): even vs odd vec_id halves of
    the embeddings table projected onto 4 seeded Gaussian hyperplanes
    (the md5/Box–Muller literals shared with the ANN oracles), full
    KS/PSI/W1/JS battery per projection — operators/drift.
    embedding_drift. The oracle embeds the SAME plane literals and
    replays projection (list_dot_product, round 6), binning, and every
    measure."""
    from bigdime_spark.operators.drift import embedding_drift

    e = _t(spark, sf_dir, "embeddings")
    raw = e.filter(F.col("vec_id") % 2 == 0).withColumn("part", F.lit("*"))
    cur = e.filter(F.col("vec_id") % 2 == 1).withColumn("part", F.lit("*"))
    d = embedding_drift(raw, cur, dim=64, nproj=4, nbins=32, seed=7)
    return d.select(
        "column",
        F.round("ks_d", 6).alias("ks_d"),
        F.round("psi", 6).alias("psi"),
        F.round("w1", 6).alias("w1"),
        F.round("js", 6).alias("js"),
        "n",
        "m",
    )


def _drift_full_sql_block(
    source_sql_r: str, source_sql_c: str, col: str, lo: float, hi: float, nbins: int
) -> str:
    """One SELECT computing ks_d/psi/w1/js/n/m — the SQL mirror of the
    full _score_histograms measure set for a single logical part."""
    eps = 1.0e-6
    bucket = (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE CAST(floor(({col} - {lo}) / {hi - lo} * {nbins}) + 1 AS INT) END"
    )
    return f"""
WITH hr AS (
  SELECT bucket, count(*) AS cnt_r FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_r})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), hc AS (
  SELECT bucket, count(*) AS cnt_c FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_c})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), joined AS (
  SELECT COALESCE(hr.bucket, hc.bucket) AS bucket,
         COALESCE(cnt_r, 0) AS cnt_r, COALESCE(cnt_c, 0) AS cnt_c
  FROM hr FULL OUTER JOIN hc ON hr.bucket = hc.bucket
), scored AS (
  SELECT bucket, cnt_r, cnt_c,
         sum(cnt_r) OVER () AS n, sum(cnt_c) OVER () AS m,
         (sum(cnt_r) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_r) OVER ()) AS ecdf_r,
         (sum(cnt_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_c) OVER ()) AS ecdf_c,
         lead(bucket) OVER (ORDER BY bucket) - bucket AS gap,
         (cnt_r + {eps}) / (sum(cnt_r) OVER () + {eps} * {nbins + 2}) AS p,
         (cnt_c + {eps}) / (sum(cnt_c) OVER () + {eps} * {nbins + 2}) AS q,
         cnt_r::DOUBLE / (sum(cnt_r) OVER ()) AS pr,
         cnt_c::DOUBLE / (sum(cnt_c) OVER ()) AS qr
  FROM joined
)
SELECT round(max(abs(ecdf_r - ecdf_c)), 6) AS ks_d,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       round(sum(abs(ecdf_r - ecdf_c) * COALESCE(gap, 0)), 6) AS w1,
       round(sum((
         CASE WHEN pr > 0 THEN pr * log2(pr / ((pr + qr) / 2)) ELSE 0 END
       + CASE WHEN qr > 0 THEN qr * log2(qr / ((pr + qr) / 2)) ELSE 0 END
       ) / 2), 6) AS js,
       max(n)::BIGINT AS n,
       max(m)::BIGINT AS m
FROM scored
"""


def _embedding_drift_sql() -> str:
    from bigdime_spark.operators.similarity import hyperplane_planes

    planes = hyperplane_planes(64, 4, seed=7)
    blocks = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        proj = f"round(list_dot_product(list_transform(embedding, x -> x::DOUBLE), {lit}), 6)"
        src_r = f"SELECT {proj} AS pj FROM embeddings WHERE vec_id % 2 = 0"
        src_c = f"SELECT {proj} AS pj FROM embeddings WHERE vec_id % 2 = 1"
        block = _drift_full_sql_block(src_r, src_c, "pj", -4.0, 4.0, 32)
        blocks.append(f"SELECT 'proj_{i}' AS column, * FROM ({block})")
    return "\nUNION ALL\n".join(blocks)


SQL_EMBEDDING_DRIFT = _embedding_drift_sql()


def q_content_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot row-content diff (round-5): the curated twin of
    orders gets o_totalprice bumped on o_orderkey % 97 == 0; the keyed
    pass's xxhash64 content digest (operators/keyed._content — rides
    the same exchange as uniqueness/referential/caption) must flag
    EXACTLY those keys. The oracle states the semantics directly —
    keys whose content columns differ — which the digest equals modulo
    xxhash64 collisions (none at this fixed dataset, and a collision
    could only SUPPRESS a real diff, never invent one)."""
    from bigdime_spark.operators.base import SuiteContext
    from bigdime_spark.operators.keyed import KeyedSnapshotPass

    o = _t(spark, sf_dir, "orders")
    raw = o.withColumn("part", F.col("o_orderstatus"))
    cur = raw.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    kp = KeyedSnapshotPass(
        key="o_orderkey",
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_content=True,
        content_cols=("o_totalprice", "o_orderpriority"),
    )
    ctx = SuiteContext(spark=spark, raw=raw, curated=cur)
    ((_, _failed, violations),) = kp.run(ctx)
    return violations.select(
        F.col("image_id").alias("okey"), F.col("part").alias("part")
    )


SQL_CONTENT_DIFF = """
SELECT o_orderkey::VARCHAR AS okey, o_orderstatus AS part
FROM orders WHERE o_orderkey % 97 = 0
"""


def q_categorical_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift (round-5): PSI/JS/chi-square over EXACT value
    counts of o_orderpriority between open and filled orders — the
    drift modality for enum columns where binned ECDFs are
    meaningless. operators/drift.categorical_drift; oracle replays the
    smoothing, the JS zero conventions, and the two-sample chi-square
    normalization term by term."""
    from bigdime_spark.operators.drift import categorical_drift

    o = _t(spark, sf_dir, "orders")
    raw = o.filter(F.col("o_orderstatus") == "O").withColumn("part", F.lit("*"))
    cur = o.filter(F.col("o_orderstatus") == "F").withColumn("part", F.lit("*"))
    d = categorical_drift(raw, cur, ("o_orderpriority",))
    return d.select(
        "column",
        F.round("psi", 6).alias("psi"),
        F.round("js", 6).alias("js"),
        F.round("chi2", 6).alias("chi2"),
        "n",
        "m",
        "n_cats",
    )


_CAT_EPS = 1.0e-6
SQL_CATEGORICAL_DRIFT = f"""
WITH cr AS (
  SELECT o_orderpriority AS value, count(*) AS cnt_r FROM orders
  WHERE o_orderstatus = 'O' AND o_orderpriority IS NOT NULL GROUP BY 1
), cc AS (
  SELECT o_orderpriority AS value, count(*) AS cnt_c FROM orders
  WHERE o_orderstatus = 'F' AND o_orderpriority IS NOT NULL GROUP BY 1
), joined AS (
  SELECT COALESCE(cr.value, cc.value) AS value,
         COALESCE(cnt_r, 0) AS cnt_r, COALESCE(cnt_c, 0) AS cnt_c
  FROM cr FULL OUTER JOIN cc ON cr.value = cc.value
), windowed AS (
  SELECT cnt_r, cnt_c,
         sum(cnt_r) OVER () AS n, sum(cnt_c) OVER () AS m,
         count(*) OVER () AS n_cats,
         cnt_r::DOUBLE / (sum(cnt_r) OVER ()) AS pr,
         cnt_c::DOUBLE / (sum(cnt_c) OVER ()) AS qr
  FROM joined
), scored AS (
  SELECT *,
         (cnt_r + {_CAT_EPS}) / (n + {_CAT_EPS} * n_cats) AS p,
         (cnt_c + {_CAT_EPS}) / (m + {_CAT_EPS} * n_cats) AS q
  FROM windowed
)
SELECT 'o_orderpriority' AS column,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       round(sum((
           CASE WHEN pr > 0 THEN pr * log2(pr / ((pr + qr) / 2)) ELSE 0 END
         + CASE WHEN qr > 0 THEN qr * log2(qr / ((pr + qr) / 2)) ELSE 0 END
       ) / 2), 6) AS js,
       round(sum(pow(sqrt(m::DOUBLE / n) * cnt_r - sqrt(n::DOUBLE / m) * cnt_c, 2)
                 / (cnt_r + cnt_c)), 6) AS chi2,
       max(n)::BIGINT AS n,
       max(m)::BIGINT AS m,
       max(n_cats)::BIGINT AS n_cats
FROM scored
"""


def q_categorical_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical column profile (round-5): exact distinct count,
    Shannon entropy (bits), and modal value + mass of documents.lang
    per source partition — operators/stats.categorical_profile. A
    per-part entropy collapse or top_frac spike is the categorical
    twin of the bit-balance degeneracy signal."""
    from bigdime_spark.operators.stats import categorical_profile

    d = _t(spark, sf_dir, "documents")
    prof = categorical_profile(
        d.withColumn("part", F.col("source")), ("lang",)
    )
    return prof.select(
        "part",
        "column",
        "n_rows",
        "n_distinct",
        F.round("entropy", 6).alias("entropy"),
        "top_value",
        F.round("top_frac", 6).alias("top_frac"),
    )


def q_distinctness_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctness / uniqueness ratio profile (round-5): deequ's
    Distinctness, Uniqueness and UniqueValueRatio analyzers per source
    partition of documents — operators/stats.distinct_value_profile.
    doc_id profiles as a perfect key (all ratios 1.0), text as
    near-unique, and lang — with nulls injected on doc_id % 7 = 0 so
    the all-three-engines null convention (kept n_rows, excluded from
    every ratio) is itself under oracle test — as a low-cardinality
    enum whose uniqueness ~ 0."""
    from bigdime_spark.operators.stats import distinct_value_profile

    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("part"),
        F.col("doc_id").cast("string").alias("doc_id"),
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang")).alias(
            "lang_n"
        ),
    )
    prof = distinct_value_profile(d, ("doc_id", "text", "lang_n"))
    return prof.select(
        "part",
        "column",
        "n_rows",
        "n_nonnull",
        "n_distinct",
        "n_once",
        F.round("distinctness", 6).alias("distinctness"),
        F.round("uniqueness", 6).alias("uniqueness"),
        F.round("unique_value_ratio", 6).alias("unique_value_ratio"),
    )


def q_distinctness_from_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctness from PERSISTED HLL sketches + null counts
    (round-5, stats.distinctness_from_stats) — zero rescan of the
    data, the ratio form of the B6 roll-up: per-part rows plus the
    table-level hll_union_agg merge in one output. The oracle states
    exact COUNT(DISTINCT) arithmetic: at these cardinalities (≤500
    distinct per column, lg_k=12) the sketch is in its exact sparse
    regime, so factoring through the persisted sketches must be
    value-invisible — the estimator-error regime is tolerance-tested
    in pytest instead. Nulls injected on doc_id % 7 = 0 so the
    rows-minus-nulls denominator is itself under oracle test."""
    from bigdime_spark.operators.stats import (
        ColumnProfile,
        StatsProfile,
        distinctness_from_stats,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("source").alias("part"),
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang")).alias(
            "lang_n"
        ),
    )
    # lg_k=16 keeps the sketch sparse-exact with a wide margin at this
    # table's ≤500-distinct columns (lg_k=12's exact bound sits right
    # at ~500: measured union est 502 there, 500 from lg_k≥14)
    prof = StatsProfile(
        columns=[
            ColumnProfile("doc_id", stringlike=True, distinct=True),
            ColumnProfile("lang_n", stringlike=True, distinct=True),
        ],
        hll_lg_k=16,
    )
    sf = d.groupBy("part").agg(*prof.agg_exprs(include_histograms=False))
    out = distinctness_from_stats(sf).unionByName(
        distinctness_from_stats(sf, table_level=True)
    )
    # r6 correctness fix (CORRECTNESS_r05 hash_match:false, VERDICT r5
    # "What's wrong" #1): the sketch's sparse-regime estimate equals
    # the exact distinct count as a VALUE but not always as a DOUBLE
    # BIT PATTERN (the estimator arithmetic can land within 1e-9 of
    # the integer), and feeding that near-integer into round(x/n, 6)
    # can end one ulp away from the oracle's round(d/n, 6). The query
    # asserts the sparse-exact regime (docstring above), so snap the
    # estimate to its integral value FIRST, then mirror the frozen
    # oracle arithmetic term-for-term: round(d, 6) and
    # round(d / nullif(n_nonnull, 0), 6) over exact doubles — the
    # operators/infer.py bit-exact mirroring discipline.
    de = F.round(F.col("distinct_est")).cast("double")
    nn = F.when(F.col("n_nonnull") == 0, F.lit(None)).otherwise(F.col("n_nonnull"))
    return out.select(
        "part",
        "column",
        "n_rows",
        "n_nonnull",
        F.round(de, 6).alias("distinct_est"),
        F.round(de / nn, 6).alias("distinctness_est"),
    )


SQL_DISTINCTNESS_FROM_STATS = """
WITH src AS (
  SELECT source AS part,
         CAST(doc_id AS VARCHAR) AS doc_id,
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_n
  FROM documents
), per AS (
  SELECT part, 'doc_id' AS col, count(*) AS n_rows,
         count(doc_id) AS n_nonnull, count(DISTINCT doc_id) AS d
  FROM src GROUP BY 1
  UNION ALL
  SELECT part, 'lang_n', count(*), count(lang_n), count(DISTINCT lang_n)
  FROM src GROUP BY 1
  UNION ALL
  SELECT '*', 'doc_id', count(*), count(doc_id), count(DISTINCT doc_id)
  FROM src
  UNION ALL
  SELECT '*', 'lang_n', count(*), count(lang_n), count(DISTINCT lang_n)
  FROM src
)
SELECT part,
       col AS column,
       n_rows::BIGINT AS n_rows,
       n_nonnull::BIGINT AS n_nonnull,
       round(d::DOUBLE, 6) AS distinct_est,
       round(d::DOUBLE / nullif(n_nonnull, 0), 6) AS distinctness_est
FROM per
"""


SQL_DISTINCTNESS = """
WITH melted AS (
  SELECT source AS part, 'doc_id' AS col, CAST(doc_id AS VARCHAR) AS value
  FROM documents
  UNION ALL
  SELECT source, 'text', text FROM documents
  UNION ALL
  SELECT source, 'lang_n',
         CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END
  FROM documents
), counts AS (
  SELECT part, col, value, count(*) AS cnt FROM melted GROUP BY 1, 2, 3
), agg AS (
  SELECT part, col,
         sum(cnt) AS n_rows,
         coalesce(sum(cnt) FILTER (WHERE value IS NOT NULL), 0) AS n_nonnull,
         count(*) FILTER (WHERE value IS NOT NULL) AS n_distinct,
         count(*) FILTER (WHERE value IS NOT NULL AND cnt = 1) AS n_once
  FROM counts GROUP BY 1, 2
)
SELECT part,
       col AS column,
       n_rows::BIGINT AS n_rows,
       n_nonnull::BIGINT AS n_nonnull,
       n_distinct::BIGINT AS n_distinct,
       n_once::BIGINT AS n_once,
       round(n_distinct::DOUBLE / nullif(n_nonnull, 0), 6) AS distinctness,
       round(n_once::DOUBLE / nullif(n_nonnull, 0), 6) AS uniqueness,
       round(n_once::DOUBLE / nullif(n_distinct, 0), 6) AS unique_value_ratio
FROM agg
"""


SQL_CATEGORICAL_PROFILE = """
WITH counts AS (
  SELECT source AS part, lang AS value, count(*) AS cnt FROM documents
  WHERE lang IS NOT NULL GROUP BY 1, 2
), scored AS (
  SELECT part, value, cnt,
         sum(cnt) OVER (PARTITION BY part) AS n_rows,
         row_number() OVER (PARTITION BY part ORDER BY cnt DESC, value ASC) AS rk
  FROM counts
)
SELECT part,
       'lang' AS column,
       max(n_rows)::BIGINT AS n_rows,
       count(*)::BIGINT AS n_distinct,
       round(sum(-(cnt::DOUBLE / n_rows) * log2(cnt::DOUBLE / n_rows)), 6) AS entropy,
       max(CASE WHEN rk = 1 THEN value END) AS top_value,
       round(max(CASE WHEN rk = 1 THEN cnt::DOUBLE / n_rows END), 6) AS top_frac
FROM scored GROUP BY part
"""


def q_mutual_info_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (round-5): dependence between documents.lang
    and the 500-char length band, per source partition —
    operators/stats.mutual_information. Pearson can't see this (lang
    is an enum); a language that suddenly DETERMINES document length
    (mi_norm → 1) is a routing/dedup bug upstream."""
    from bigdime_spark.operators.stats import mutual_information

    d = _t(spark, sf_dir, "documents")
    dd = d.withColumn("part", F.col("source")).withColumn(
        "len_band", F.floor(F.col("n_chars") / F.lit(500))
    )
    return mutual_information(dd, "lang", "len_band")


SQL_MUTUAL_INFO = """
WITH j AS (
  SELECT source AS part, lang AS x, floor(n_chars / 500.0) AS y,
         count(*)::DOUBLE AS c
  FROM documents
  WHERE lang IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2, 3
), m AS (
  SELECT part, c,
         sum(c) OVER (PARTITION BY part, x) AS cx,
         sum(c) OVER (PARTITION BY part, y) AS cy,
         sum(c) OVER (PARTITION BY part) AS n
  FROM j
)
SELECT part,
       max(n)::BIGINT AS n_rows,
       round(greatest(0.0, sum(c / n * log2(c * n / (cx * cy)))), 6) AS mi,
       round(greatest(0.0, sum(-c / n * log2(cx / n))), 6) AS h_x,
       round(greatest(0.0, sum(-c / n * log2(cy / n))), 6) AS h_y,
       round(greatest(0.0, sum(c / n * log2(c * n / (cx * cy))))
             / least(greatest(0.0, sum(-c / n * log2(cx / n))),
                     greatest(0.0, sum(-c / n * log2(cy / n)))), 6) AS mi_norm
FROM m GROUP BY part
"""


def q_mutual_info_shift_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot dependence drift (operators/stats.
    mutual_info_shift): |Δ mi_norm| of (lang, 500-char length band)
    per source; the deterministic n_chars%3 subset plays the curated
    snapshot (its joint distribution differs — length bands thin out
    unevenly per language). Join is parts-sized — metadata-scale."""
    from bigdime_spark.operators.stats import mutual_info_shift

    d = _t(spark, sf_dir, "documents").withColumn("part", F.col("source")).withColumn(
        "len_band", F.floor(F.col("n_chars") / F.lit(500))
    )
    cur = d.filter(F.col("n_chars") % 3 != 0)
    return mutual_info_shift(d, cur, "lang", "len_band")


SQL_MUTUAL_INFO_SHIFT = """
WITH j1 AS (
  SELECT source AS part, lang AS x, floor(n_chars / 500.0) AS y,
         count(*)::DOUBLE AS c
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2, 3
), m1 AS (
  SELECT part, c,
         sum(c) OVER (PARTITION BY part, x) AS cx,
         sum(c) OVER (PARTITION BY part, y) AS cy,
         sum(c) OVER (PARTITION BY part) AS n
  FROM j1
), a AS (
  SELECT part, max(n)::BIGINT AS n_raw,
         round(greatest(0.0, sum(c / n * log2(c * n / (cx * cy))))
               / least(greatest(0.0, sum(-c / n * log2(cx / n))),
                       greatest(0.0, sum(-c / n * log2(cy / n)))), 6) AS mi_norm_raw
  FROM m1 GROUP BY part
), j2 AS (
  SELECT source AS part, lang AS x, floor(n_chars / 500.0) AS y,
         count(*)::DOUBLE AS c
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
        AND n_chars % 3 <> 0
  GROUP BY 1, 2, 3
), m2 AS (
  SELECT part, c,
         sum(c) OVER (PARTITION BY part, x) AS cx,
         sum(c) OVER (PARTITION BY part, y) AS cy,
         sum(c) OVER (PARTITION BY part) AS n
  FROM j2
), b AS (
  SELECT part, max(n)::BIGINT AS n_cur,
         round(greatest(0.0, sum(c / n * log2(c * n / (cx * cy))))
               / least(greatest(0.0, sum(-c / n * log2(cx / n))),
                       greatest(0.0, sum(-c / n * log2(cy / n)))), 6) AS mi_norm_cur
  FROM m2 GROUP BY part
)
SELECT part, n_raw, n_cur, mi_norm_raw, mi_norm_cur,
       round(abs(mi_norm_raw - mi_norm_cur), 6) AS mi_shift
FROM a FULL OUTER JOIN b USING (part)
"""


def q_domain_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 range/domain checks as (constraint, bad_rows) rows."""
    p = _t(spark, sf_dir, "part")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def one(df: DataFrame, name: str, pred) -> DataFrame:
        return df.agg(F.count_if(~pred).alias("bad_rows")).select(
            F.lit(name).alias("constraint"), "bad_rows"
        )

    frames = [
        one(p, "p_size_in_1_50", F.col("p_size").between(1, 50)),
        one(o, "o_orderstatus_known", F.col("o_orderstatus").isin("O", "F", "P")),
        one(li, "l_discount_in_0_1", F.col("l_discount").between(0.0, 1.0)),
        one(li, "l_quantity_positive", F.col("l_quantity") > 0),
        one(li, "l_extendedprice_under_100k", F.col("l_extendedprice") < 100000.0),
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


SQL_DOMAIN_VIOLATIONS = """
SELECT 'p_size_in_1_50' AS constraint, count(*) FILTER (WHERE NOT (p_size BETWEEN 1 AND 50)) AS bad_rows FROM part
UNION ALL
SELECT 'o_orderstatus_known', count(*) FILTER (WHERE NOT (o_orderstatus IN ('O','F','P'))) FROM orders
UNION ALL
SELECT 'l_discount_in_0_1', count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 1.0)) FROM lineitem
UNION ALL
SELECT 'l_quantity_positive', count(*) FILTER (WHERE NOT (l_quantity > 0)) FROM lineitem
UNION ALL
SELECT 'l_extendedprice_under_100k', count(*) FILTER (WHERE NOT (l_extendedprice < 100000.0)) FROM lineitem
"""


def q_compliance_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C55 Compliance (deequ parity): tolerance-bounded predicate
    fractions per part, via the REAL fusable constraint objects —
    three constraints in ONE aggregation exercising the PASS branch,
    the FAIL branch, and the NULL-predicate → non-satisfying collapse
    (`nullif(event_type,'error') = event_type` is NULL for every
    'error' row, so that part's fraction is exactly 0)."""
    from bigdime_spark.operators.base import fused_agg_exprs
    from bigdime_spark.operators.row_checks import Compliance

    ev = _t(spark, sf_dir, "events")
    cons = [
        Compliance("value_nonneg", F.expr("value >= 0"), "value", 0.999),
        Compliance("value_under_100", F.expr("value < 100.0"), "value", 0.865),
        Compliance(
            "non_error",
            F.expr("nullif(event_type, 'error') = event_type"),
            "event_type",
            0.5,
        ),
    ]
    out = ev.groupBy(F.col("event_type").alias("part")).agg(
        *fused_agg_exprs(cons)
    )
    sel = [F.col("part")]
    for c in cons:
        short = c.name.split(".", 1)[1]
        sel.append(F.round(c._frac(), 6).alias(f"{short}_frac"))
        sel.append(c.verdict_col().alias(f"{short}_verdict"))
    return out.select(*sel)


SQL_COMPLIANCE = """
SELECT event_type AS part,
  round(count(*) FILTER (WHERE COALESCE(value >= 0, FALSE)) / CAST(count(*) AS DOUBLE), 6) AS value_nonneg_frac,
  CASE WHEN count(*) FILTER (WHERE COALESCE(value >= 0, FALSE)) / CAST(count(*) AS DOUBLE) >= 0.999
       THEN 'PASS' ELSE 'FAIL' END AS value_nonneg_verdict,
  round(count(*) FILTER (WHERE COALESCE(value < 100.0, FALSE)) / CAST(count(*) AS DOUBLE), 6) AS value_under_100_frac,
  CASE WHEN count(*) FILTER (WHERE COALESCE(value < 100.0, FALSE)) / CAST(count(*) AS DOUBLE) >= 0.865
       THEN 'PASS' ELSE 'FAIL' END AS value_under_100_verdict,
  round(count(*) FILTER (WHERE COALESCE(nullif(event_type, 'error') = event_type, FALSE)) / CAST(count(*) AS DOUBLE), 6) AS non_error_frac,
  CASE WHEN count(*) FILTER (WHERE COALESCE(nullif(event_type, 'error') = event_type, FALSE)) / CAST(count(*) AS DOUBLE) >= 0.5
       THEN 'PASS' ELSE 'FAIL' END AS non_error_verdict
FROM events GROUP BY 1
"""


def q_type_conformance_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 type-conformance validator: per-part counts of string values
    that fail try_cast to the declared type. `o_orderpriority` never
    parses as INT (genuine FAIL rows); its leading digit always does
    (genuine PASS rows) — both verdict branches exercised.
    NOTE: decimal-looking strings are deliberately absent — Spark
    try_cast('4.5' AS INT) is NULL while DuckDB rounds to 5."""
    o = _t(spark, sf_dir, "orders")
    prio_bad = F.expr(
        "try_cast(o_orderpriority AS INT) IS NULL AND o_orderpriority IS NOT NULL"
    )
    digit_bad = F.expr(
        "try_cast(substring(o_orderpriority, 1, 1) AS INT) IS NULL"
        " AND o_orderpriority IS NOT NULL"
    )
    return (
        o.groupBy(F.col("o_orderstatus").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(prio_bad).alias("prio_bad"),
            F.count_if(digit_bad).alias("digit_bad"),
        )
        .select(
            "part",
            "n_rows",
            "prio_bad",
            "digit_bad",
            F.when(F.col("prio_bad") == 0, F.lit("PASS")).otherwise(F.lit("FAIL")).alias("prio_verdict"),
            F.when(F.col("digit_bad") == 0, F.lit("PASS")).otherwise(F.lit("FAIL")).alias("digit_verdict"),
        )
    )


SQL_TYPE_CONFORMANCE = """
SELECT o_orderstatus AS part,
       count(*) AS n_rows,
       count(*) FILTER (WHERE TRY_CAST(o_orderpriority AS INT) IS NULL
                          AND o_orderpriority IS NOT NULL) AS prio_bad,
       count(*) FILTER (WHERE TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) IS NULL
                          AND o_orderpriority IS NOT NULL) AS digit_bad,
       CASE WHEN count(*) FILTER (WHERE TRY_CAST(o_orderpriority AS INT) IS NULL
                                    AND o_orderpriority IS NOT NULL) = 0
            THEN 'PASS' ELSE 'FAIL' END AS prio_verdict,
       CASE WHEN count(*) FILTER (WHERE TRY_CAST(substr(o_orderpriority, 1, 1) AS INT) IS NULL
                                    AND o_orderpriority IS NOT NULL) = 0
            THEN 'PASS' ELSE 'FAIL' END AS digit_verdict
FROM orders GROUP BY 1
"""


def q_checksum_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 order-insensitive content checksum, PORTABLE variant: the
    per-row digest is the first 10 hex chars of md5 over a canonical
    row representation, reduced with commutative XOR + SUM. (The
    production path uses xxhash64 + decimal(38) sums — see
    functions/hashes.py — but md5 is what both engines share.)"""
    li = _t(spark, sf_dir, "lineitem")
    repr_col = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.round(F.col("l_extendedprice") * 100).cast("long").cast("string"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    h = F.conv(F.substring(F.md5(repr_col), 1, 10), 16, 10).cast("long")
    return (
        li.select(F.col("l_returnflag").alias("part"), h.alias("_h"))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("_h").alias("checksum_xor"),
            F.sum("_h").alias("checksum_sum"),
        )
    )


# DuckDB has no hex→int conv; rebuild the same 40-bit value digit by digit.
_HEXVAL = "(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1)"
_DIGITS = " + ".join(
    f"{_HEXVAL.format(i=i + 1)} * {16 ** (9 - i)}::BIGINT" for i in range(10)
)
SQL_CHECKSUM = f"""
WITH rowrepr AS (
  SELECT l_returnflag AS part,
         md5(concat_ws('|',
             l_orderkey::VARCHAR,
             l_linenumber::VARCHAR,
             CAST(round(l_extendedprice * 100) AS BIGINT)::VARCHAR,
             l_returnflag,
             l_linestatus,
             strftime(l_shipdate, '%Y-%m-%d'))) AS h
  FROM lineitem
), hashed AS (
  SELECT part, {_DIGITS} AS hv FROM rowrepr
)
SELECT part,
       count(*) AS n_rows,
       bit_xor(hv) AS checksum_xor,
       CAST(sum(hv) AS BIGINT) AS checksum_sum
FROM hashed GROUP BY 1
"""


# =====================================================================
# §2.3 drift (B18 KS + B19 PSI over shared fixed bins)
# =====================================================================

def q_drift_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    spec = DriftColumn("l_extendedprice", 900.0, 105000.0, 64)
    raw = li.filter(F.col("l_returnflag") == "R").withColumn("part", F.lit("*"))
    cur = li.filter(F.col("l_returnflag") == "N").withColumn("part", F.lit("*"))
    d = two_sample_drift(raw, cur, spec)
    return d.select(
        F.round("ks_d", 6).alias("ks_d"),
        F.round("ks_threshold", 6).alias("ks_threshold"),
        F.round("psi", 6).alias("psi"),
        F.col("n").alias("n"),
        F.col("m").alias("m"),
        F.when(F.col("ks_d") <= F.col("ks_threshold"), F.lit("PASS"))
        .otherwise(F.lit("FAIL"))
        .alias("ks_verdict"),
    )


def _drift_sql(
    source_sql_r: str, source_sql_c: str, col: str, lo: float, hi: float, nbins: int
) -> str:
    """The exact SQL mirror of operators/drift.two_sample_drift for a
    single logical partition (engine formula comment: histograms.py)."""
    eps = 1.0e-6
    bucket = (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE CAST(floor(({col} - {lo}) / {hi - lo} * {nbins}) + 1 AS INT) END"
    )
    return f"""
WITH hr AS (
  SELECT bucket, count(*) AS cnt_r FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_r})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), hc AS (
  SELECT bucket, count(*) AS cnt_c FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_c})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), joined AS (
  SELECT COALESCE(hr.bucket, hc.bucket) AS bucket,
         COALESCE(cnt_r, 0) AS cnt_r,
         COALESCE(cnt_c, 0) AS cnt_c
  FROM hr FULL OUTER JOIN hc ON hr.bucket = hc.bucket
), scored AS (
  SELECT bucket, cnt_r, cnt_c,
         sum(cnt_r) OVER () AS n,
         sum(cnt_c) OVER () AS m,
         (sum(cnt_r) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_r) OVER ()) AS ecdf_r,
         (sum(cnt_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_c) OVER ()) AS ecdf_c,
         (cnt_r + {eps}) / (sum(cnt_r) OVER () + {eps} * {nbins + 2}) AS p,
         (cnt_c + {eps}) / (sum(cnt_c) OVER () + {eps} * {nbins + 2}) AS q
  FROM joined
)
SELECT round(max(abs(ecdf_r - ecdf_c)), 6) AS ks_d,
       round(1.358 * sqrt((max(n) + max(m))::DOUBLE / (max(n) * max(m))::DOUBLE), 6) AS ks_threshold,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       max(n)::BIGINT AS n,
       max(m)::BIGINT AS m,
       CASE WHEN max(abs(ecdf_r - ecdf_c)) <= 1.358 * sqrt((max(n) + max(m))::DOUBLE / (max(n) * max(m))::DOUBLE)
            THEN 'PASS' ELSE 'FAIL' END AS ks_verdict
FROM scored
"""


SQL_DRIFT_EXTENDEDPRICE = _drift_sql(
    "SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'R'",
    "SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'N'",
    "l_extendedprice",
    900.0,
    105000.0,
    64,
)


def q_drift_w1_js_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 drift-measure extension: Wasserstein-1 (bucket units,
    sparse gap-weighted ECDF integral) and Jensen–Shannon divergence
    (log2, unsmoothed proportions) out of the SAME melted-histogram
    join that produces KS/PSI — operators/drift._score_histograms,
    zero extra scans. The oracle replays the gap-run W1 and the
    0·log 0 JS convention bucket by bucket."""
    li = _t(spark, sf_dir, "lineitem")
    spec = DriftColumn("l_extendedprice", 900.0, 105000.0, 64)
    raw = li.filter(F.col("l_returnflag") == "R").withColumn("part", F.lit("*"))
    cur = li.filter(F.col("l_returnflag") == "N").withColumn("part", F.lit("*"))
    d = two_sample_drift(raw, cur, spec)
    return d.select(
        F.round("w1", 6).alias("w1"),
        F.round("js", 6).alias("js"),
        F.col("n").alias("n"),
        F.col("m").alias("m"),
    )


def _drift_w1_js_sql(
    source_sql_r: str, source_sql_c: str, col: str, lo: float, hi: float, nbins: int
) -> str:
    """SQL mirror of the W1/JS measures of _score_histograms."""
    bucket = (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE CAST(floor(({col} - {lo}) / {hi - lo} * {nbins}) + 1 AS INT) END"
    )
    return f"""
WITH hr AS (
  SELECT bucket, count(*) AS cnt_r FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_r})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), hc AS (
  SELECT bucket, count(*) AS cnt_c FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_c})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), joined AS (
  SELECT COALESCE(hr.bucket, hc.bucket) AS bucket,
         COALESCE(cnt_r, 0) AS cnt_r,
         COALESCE(cnt_c, 0) AS cnt_c
  FROM hr FULL OUTER JOIN hc ON hr.bucket = hc.bucket
), scored AS (
  SELECT bucket,
         sum(cnt_r) OVER () AS n,
         sum(cnt_c) OVER () AS m,
         (sum(cnt_r) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_r) OVER ()) AS ecdf_r,
         (sum(cnt_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_c) OVER ()) AS ecdf_c,
         lead(bucket) OVER (ORDER BY bucket) - bucket AS gap,
         cnt_r::DOUBLE / (sum(cnt_r) OVER ()) AS pr,
         cnt_c::DOUBLE / (sum(cnt_c) OVER ()) AS qr
  FROM joined
)
SELECT round(sum(abs(ecdf_r - ecdf_c) * COALESCE(gap, 0)), 6) AS w1,
       round(sum((
         CASE WHEN pr > 0 THEN pr * log2(pr / ((pr + qr) / 2)) ELSE 0 END
       + CASE WHEN qr > 0 THEN qr * log2(qr / ((pr + qr) / 2)) ELSE 0 END
       ) / 2), 6) AS js,
       max(n)::BIGINT AS n,
       max(m)::BIGINT AS m
FROM scored
"""


SQL_DRIFT_W1_JS = _drift_w1_js_sql(
    "SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'R'",
    "SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'N'",
    "l_extendedprice",
    900.0,
    105000.0,
    64,
)


def q_drift_buckets_extendedprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-level drift triage (round-5, C70): WHICH value ranges
    drive the KS/PSI score — per observed bucket, value bounds, both
    shares, and each measure's per-bucket summand, out of the SAME
    melted-histogram join the aggregate scorer folds
    (operators/drift.drift_contributions). The oracle replays the
    join, the window intermediates, the value-bound arithmetic and
    the ranking bucket by bucket; additivity back to the aggregate
    scores is pytest-asserted."""
    from bigdime_spark.operators.drift import drift_contributions, top_drift_buckets

    li = _t(spark, sf_dir, "lineitem")
    spec = DriftColumn("l_extendedprice", 900.0, 105000.0, 16)
    raw = li.filter(F.col("l_returnflag") == "R").withColumn("part", F.lit("*"))
    cur = li.filter(F.col("l_returnflag") == "N").withColumn("part", F.lit("*"))
    contrib = drift_contributions(raw, cur, (spec,))
    return top_drift_buckets(contrib, k=1_000_000).select(
        "bucket",
        F.round("lo", 6).alias("lo"),
        F.round("hi", 6).alias("hi"),
        "cnt_r",
        "cnt_c",
        F.round("share_r", 6).alias("share_r"),
        F.round("share_c", 6).alias("share_c"),
        F.round("delta_share", 6).alias("delta_share"),
        F.round("ecdf_gap", 6).alias("ecdf_gap"),
        F.round("psi_term", 6).alias("psi_term"),
        F.round("js_term", 6).alias("js_term"),
        "rank",
    )


def _drift_buckets_sql(
    source_sql_r: str, source_sql_c: str, col: str, lo: float, hi: float, nbins: int
) -> str:
    """SQL mirror of drift_contributions + top_drift_buckets for one
    logical partition: same bucket formula, full-outer join, window
    intermediates, ε-smoothing, value-bound arithmetic (identical
    literal width so the float ops replay bit-exactly) and rank
    ordering as the engine."""
    eps = 1.0e-6
    width = (hi - lo) / nbins
    bucket = (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE CAST(floor(({col} - {lo}) / {hi - lo} * {nbins}) + 1 AS INT) END"
    )
    return f"""
WITH hr AS (
  SELECT bucket, count(*) AS cnt_r FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_r})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), hc AS (
  SELECT bucket, count(*) AS cnt_c FROM (
    SELECT {bucket} AS bucket FROM ({source_sql_c})
  ) WHERE bucket IS NOT NULL GROUP BY 1
), joined AS (
  SELECT COALESCE(hr.bucket, hc.bucket) AS bucket,
         COALESCE(cnt_r, 0) AS cnt_r,
         COALESCE(cnt_c, 0) AS cnt_c
  FROM hr FULL OUTER JOIN hc ON hr.bucket = hc.bucket
), scored AS (
  SELECT bucket, cnt_r, cnt_c,
         sum(cnt_r) OVER () AS n,
         sum(cnt_c) OVER () AS m,
         (sum(cnt_r) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_r) OVER ()) AS ecdf_r,
         (sum(cnt_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_c) OVER ()) AS ecdf_c,
         (cnt_r + {eps}) / (sum(cnt_r) OVER () + {eps} * {nbins + 2}) AS p,
         (cnt_c + {eps}) / (sum(cnt_c) OVER () + {eps} * {nbins + 2}) AS q,
         cnt_r::DOUBLE / (sum(cnt_r) OVER ()) AS pr,
         cnt_c::DOUBLE / (sum(cnt_c) OVER ()) AS qr
  FROM joined
), contrib AS (
  SELECT bucket,
         CASE WHEN bucket = 0 THEN NULL
              ELSE {lo!r} + (bucket - 1) * {width!r} END AS lo,
         CASE WHEN bucket = {nbins + 1} THEN NULL
              ELSE {lo!r} + bucket * {width!r} END AS hi,
         cnt_r, cnt_c,
         pr AS share_r,
         qr AS share_c,
         qr - pr AS delta_share,
         abs(ecdf_r - ecdf_c) AS ecdf_gap,
         (p - q) * ln(p / q) AS psi_term,
         (CASE WHEN pr > 0 THEN pr * log2(pr / ((pr + qr) / 2)) ELSE 0 END
        + CASE WHEN qr > 0 THEN qr * log2(qr / ((pr + qr) / 2)) ELSE 0 END
         ) / 2 AS js_term
  FROM scored
)
SELECT bucket, round(lo, 6) AS lo, round(hi, 6) AS hi, cnt_r, cnt_c,
       round(share_r, 6) AS share_r, round(share_c, 6) AS share_c,
       round(delta_share, 6) AS delta_share,
       round(ecdf_gap, 6) AS ecdf_gap,
       round(psi_term, 6) AS psi_term,
       round(js_term, 6) AS js_term,
       row_number() OVER (
         ORDER BY abs(psi_term) DESC, ecdf_gap DESC, bucket ASC
       )::INT AS rank
FROM contrib
"""


SQL_DRIFT_BUCKETS = _drift_buckets_sql(
    "SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'R'",
    "SELECT l_extendedprice FROM lineitem WHERE l_returnflag = 'N'",
    "l_extendedprice",
    900.0,
    105000.0,
    16,
)


def q_sampled_gate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson-certified sampled gate (round-5, C71): a deterministic
    30% hash sample per l_returnflag 'part', k = sampled rows breaking
    a returnflag-dependent quantity rule (R's tighter bound makes it
    certifiably OVER the 12% tolerance, the others certifiably under
    → both FAIL and PASS paths execute), gated by
    operators/infer.sampled_rate_gate at z=1.96. The oracle replays
    the md5 keep-predicate digit by digit and the Wilson arithmetic
    term by term."""
    from bigdime_spark.operators.infer import sampled_rate_gate
    from bigdime_spark.operators.sampling import sample_hash, threshold_for_rate

    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    kept = sample_hash(key, "gate") < F.lit(threshold_for_rate(0.3))
    viol = F.col("l_quantity") > F.when(
        F.col("l_returnflag") == "R", F.lit(40)
    ).otherwise(F.lit(48))
    counts = li.groupBy(F.col("l_returnflag").alias("part")).agg(
        F.count_if(kept).alias("n"),
        F.count_if(kept & viol).alias("k"),
    )
    g = sampled_rate_gate(counts, max_rate=0.12, z=1.96)
    return g.select(
        "part",
        "n",
        "k",
        F.round("rate_hat", 6).alias("rate_hat"),
        F.round("ci_lo", 6).alias("ci_lo"),
        F.round("ci_hi", 6).alias("ci_hi"),
        "verdict",
    )


def _sampled_gate_sql(rate: float, max_rate: float, z: float) -> str:
    """SQL mirror of q_sampled_gate_lineitem: the 40-bit md5 sample
    space rebuilt digit by digit (the checksum-oracle expansion), then
    the Wilson interval with the identical term order."""
    from bigdime_spark.operators.sampling import SAMPLE_SPACE

    threshold = min(SAMPLE_SPACE, int(rate * SAMPLE_SPACE))
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (9 - i)}::BIGINT"
        for i in range(10)
    )
    z2 = z * z
    return f"""
WITH hashed AS (
  SELECT l_returnflag, l_quantity,
         md5(concat_ws(':',
             concat_ws('-', l_orderkey::VARCHAR, l_linenumber::VARCHAR),
             'gate')) AS h
  FROM lineitem
), counts AS (
  SELECT l_returnflag AS part,
         count(*) FILTER (({digits}) < {threshold}) AS n,
         count(*) FILTER (
           ({digits}) < {threshold}
           AND l_quantity > CASE WHEN l_returnflag = 'R' THEN 40 ELSE 48 END
         ) AS k
  FROM hashed GROUP BY 1
), wilson AS (
  SELECT part, n, k,
         k::DOUBLE / n::DOUBLE AS phat,
         1.0 + {z2!r} / n::DOUBLE AS denom,
         (k::DOUBLE / n::DOUBLE + {z2!r} / (2.0 * n::DOUBLE)) AS center_num,
         {z!r} * sqrt(
           (k::DOUBLE / n::DOUBLE) * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE
           + {z2!r} / (4.0 * n::DOUBLE * n::DOUBLE)
         ) AS half_num
  FROM counts
), bounds AS (
  SELECT part, n, k, phat,
         CASE WHEN n <= 0 THEN NULL
              ELSE greatest(0.0, center_num / denom - half_num / denom) END AS ci_lo,
         CASE WHEN n <= 0 THEN NULL
              ELSE least(1.0, center_num / denom + half_num / denom) END AS ci_hi
  FROM wilson
)
SELECT part, n, k,
       round(phat, 6) AS rate_hat,
       round(ci_lo, 6) AS ci_lo,
       round(ci_hi, 6) AS ci_hi,
       CASE WHEN n IS NULL OR n <= 0 THEN 'NOT_READY'
            WHEN ci_lo > {max_rate!r} THEN 'FAIL'
            WHEN ci_hi <= {max_rate!r} THEN 'PASS'
            ELSE 'NOT_READY' END AS verdict
FROM bounds
"""


SQL_SAMPLED_GATE = _sampled_gate_sql(0.3, 0.12, 1.96)


#: the shared deterministic null plant for the C72 queries: value goes
#: NULL on every third error event — a segment-concentrated null burst
#: a part-level null-rate check dilutes below threshold
_GROUPED_SRC_SQL = """
  SELECT concat('p', (user_id % 3)::VARCHAR) AS part, event_type,
         CASE WHEN event_type = 'error' AND event_id % 3 = 0
              THEN NULL ELSE value END AS v
  FROM events
"""


def _grouped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("p"), (F.col("user_id") % 3).cast("string")).alias("part"),
        "event_type",
        F.when(
            (F.col("event_type") == "error") & (F.col("event_id") % 3 == 0),
            F.lit(None),
        )
        .otherwise(F.col("value"))
        .alias("v"),
    )


def q_stratified_gate_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampled gate (round-5, C77): per-(part, stratum)
    keep-thresholds boosted to a minimum expected sample size
    (operators/infer.stratified_thresholds), the deterministic hash
    selection, and the per-stratum Wilson certification — rare strata
    keep certifiable coverage a uniform sample never gives them. part
    = l_linestatus, stratum = l_returnflag with every 50th order
    remapped to a synthetic 'rare' stratum (~2% of rows — small enough
    that the 5% base rate alone could never certify it), violation =
    qty > 45,
    base rate 5%, min_n 400 (forces a real boost on the smaller
    strata), tolerance 12%. The oracle replays the integer threshold
    arithmetic, the 40-bit md5 selection digit by digit, and the
    Wilson folds."""
    from bigdime_spark.operators.infer import (
        sampled_rate_gate,
        stratified_thresholds,
    )
    from bigdime_spark.operators.sampling import sample_hash

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_linestatus").alias("part"),
        F.when(F.col("l_orderkey") % 50 == 0, F.lit("rare"))
        .otherwise(F.col("l_returnflag"))
        .alias("flag"),
        F.concat_ws(
            "-",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("key"),
        F.col("l_quantity").alias("qty"),
    )
    thr = stratified_thresholds(li, "flag", base_rate=0.05, min_n=400)
    kept = sample_hash(F.col("key"), "sgate") < F.col("threshold")
    counts = (
        li.join(F.broadcast(thr.select("part", "flag", "threshold")), ["part", "flag"])
        .groupBy("part", "flag")
        .agg(
            F.count_if(kept).alias("n"),
            F.count_if(kept & (F.col("qty") > 45)).alias("k"),
        )
    )
    g = sampled_rate_gate(counts, max_rate=0.12, z=1.96)
    return (
        g.join(thr.select("part", "flag", "n_pop", "threshold"), ["part", "flag"])
        .select(
            "part",
            "flag",
            "n_pop",
            "threshold",
            "n",
            "k",
            F.round("rate_hat", 6).alias("rate_hat"),
            F.round("ci_lo", 6).alias("ci_lo"),
            F.round("ci_hi", 6).alias("ci_hi"),
            "verdict",
        )
    )


def _stratified_gate_sql(
    base_rate: float, min_n: int, max_rate: float, z: float
) -> str:
    from bigdime_spark.operators.sampling import SAMPLE_SPACE, threshold_for_rate

    base_thr = threshold_for_rate(base_rate)
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (9 - i)}::BIGINT"
        for i in range(10)
    )
    z2 = z * z
    return f"""
WITH src AS (
  SELECT l_linestatus AS part,
         CASE WHEN l_orderkey % 50 = 0 THEN 'rare' ELSE l_returnflag END AS flag,
         l_quantity AS qty,
         md5(concat_ws(':',
             concat_ws('-', l_orderkey::VARCHAR, l_linenumber::VARCHAR),
             'sgate')) AS h
  FROM lineitem
), thr AS (
  SELECT part, flag, count(*) AS n_pop,
         least({SAMPLE_SPACE}::BIGINT,
               greatest({base_thr}::BIGINT,
                        CAST(ceil({float(SAMPLE_SPACE)!r} * {float(min_n)!r}
                                  / count(*)::DOUBLE) AS BIGINT))) AS threshold
  FROM src GROUP BY 1, 2
), counts AS (
  SELECT s.part, s.flag, t.n_pop, t.threshold,
         count(*) FILTER (({digits}) < t.threshold) AS n,
         count(*) FILTER (({digits}) < t.threshold AND s.qty > 45) AS k
  FROM src s JOIN thr t ON s.part = t.part AND s.flag = t.flag
  GROUP BY 1, 2, 3, 4
), wilson AS (
  SELECT part, flag, n_pop, threshold, n, k,
         k::DOUBLE / n::DOUBLE AS phat,
         1.0 + {z2!r} / n::DOUBLE AS denom,
         (k::DOUBLE / n::DOUBLE + {z2!r} / (2.0 * n::DOUBLE)) AS cn,
         {z!r} * sqrt(
           (k::DOUBLE / n::DOUBLE) * (1.0 - k::DOUBLE / n::DOUBLE) / n::DOUBLE
           + {z2!r} / (4.0 * n::DOUBLE * n::DOUBLE)
         ) AS hn
  FROM counts
), bounds AS (
  SELECT part, flag, n_pop, threshold, n, k, phat,
         CASE WHEN n <= 0 THEN NULL
              ELSE greatest(0.0, cn / denom - hn / denom) END AS ci_lo,
         CASE WHEN n <= 0 THEN NULL
              ELSE least(1.0, cn / denom + hn / denom) END AS ci_hi
  FROM wilson
)
SELECT part, flag, n_pop, threshold, n, k,
       round(phat, 6) AS rate_hat,
       round(ci_lo, 6) AS ci_lo,
       round(ci_hi, 6) AS ci_hi,
       CASE WHEN n IS NULL OR n <= 0 THEN 'NOT_READY'
            WHEN ci_lo > {max_rate!r} THEN 'FAIL'
            WHEN ci_hi <= {max_rate!r} THEN 'PASS'
            ELSE 'NOT_READY' END AS verdict
FROM bounds
"""


SQL_STRATIFIED_GATE = _stratified_gate_sql(0.05, 400, 0.12, 1.96)


def q_grouped_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped metric profile (round-5, C72): per (part, event_type)
    null-rate/mean/distinct of a value column with a deterministic
    segment-concentrated null plant — the (part, group) hash agg
    behind GroupedBound (operators/grouped.grouped_metrics). The
    oracle replays the plant and every metric."""
    from bigdime_spark.operators.grouped import grouped_metrics

    prof = grouped_metrics(_grouped_events(spark, sf_dir), "v", "event_type")
    return prof.select(
        "part",
        "group",
        "n",
        "n_null",
        F.round("null_rate", 6).alias("null_rate"),
        F.round("mean", 6).alias("mean_v"),
        "n_distinct",
    )


SQL_GROUPED_PROFILE = f"""
WITH src AS ({_GROUPED_SRC_SQL})
SELECT part, event_type AS "group", count(*) AS n,
       count(*) - count(v) AS n_null,
       round((count(*) - count(v)) / count(*), 6) AS null_rate,
       round(avg(v), 6) AS mean_v,
       count(DISTINCT v) AS n_distinct
FROM src GROUP BY 1, 2
"""


def q_caption_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption text-quality gate (round-5, C75): per-part MEANS of the
    C12 quality features over a caption-shaped column, with two
    declared bounds evaluated through the FUSED-agg path
    (operators/caption.CaptionQualityBound via fused_agg_exprs — the
    same assembly the suite runs). Fixture: documents.text as the
    caption, part = doc_id % 4. The oracle replays the per-row
    feature SQL (the C12 mirror), the per-part means and both verdict
    folds."""
    from bigdime_spark.operators.base import fused_agg_exprs
    from bigdime_spark.operators.caption import CaptionQualityBound

    d = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("p"), (F.col("doc_id") % 4).cast("string")).alias("part"),
        F.col("text").alias("caption"),
    )
    b_q = CaptionQualityBound("quality_score", lo=0.2)
    b_t = CaptionQualityBound("n_tokens", lo=1.0, hi=500.0)
    fused = d.groupBy("part").agg(*fused_agg_exprs([b_q, b_t]))
    return fused.select(
        "part",
        F.round(b_q._m(), 6).alias("mean_quality"),
        F.round(b_t._m(), 6).alias("mean_tokens"),
        b_q.verdict_col().alias("verdict_quality"),
        b_t.verdict_col().alias("verdict_tokens"),
        b_q.observed_col().alias("observed_quality"),
        b_t.expected_col().alias("expected_tokens"),
    )




def q_grouped_verdict_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupedBound verdict fold (C72): null_rate of the planted
    frame bounded at hi=0.1 per event_type — the error segment (~1/3
    null) must FAIL every part with itself as the worst group while
    the part-level rate (~1/15) would sail under the same bound. The
    oracle replays the eligibility filter, breach test, worst-group
    window and both observed-string branches."""
    from bigdime_spark.operators.base import SuiteContext
    from bigdime_spark.operators.grouped import GroupedBound

    ctx = SuiteContext(spark=spark, raw=_grouped_events(spark, sf_dir))
    found, viol = GroupedBound(
        "v", "event_type", metric="null_rate", hi=0.1, min_support=5
    ).run(ctx)
    return found.select("part", "verdict", "observed", "expected")


SQL_GROUPED_VERDICT = f"""
WITH src AS ({_GROUPED_SRC_SQL}),
prof AS (
  SELECT part, event_type AS grp, count(*) AS n,
         (count(*) - count(v)) / count(*) AS m
  FROM src GROUP BY 1, 2
), flagged AS (
  SELECT part, grp, n,
         CASE WHEN n >= 5 THEN m END AS m,
         (n >= 5 AND m IS NOT NULL AND (m < 0.0 OR m > 0.1)) AS breach,
         row_number() OVER (
           PARTITION BY part
           ORDER BY (CASE WHEN n >= 5 AND m IS NOT NULL AND (m < 0.0 OR m > 0.1)
                          THEN CASE WHEN m < 0.0 THEN 0.0 - m ELSE m - 0.1 END
                     END) DESC NULLS LAST, grp ASC
         ) AS rk
  FROM prof
)
SELECT part,
       CASE WHEN count(*) FILTER (breach) > 0 THEN 'FAIL'
            WHEN count(*) FILTER (m IS NOT NULL) = 0 THEN 'NOT_READY'
            ELSE 'PASS' END AS verdict,
       CASE WHEN count(*) FILTER (breach) > 0 THEN
         concat('breaching=', (count(*) FILTER (breach))::VARCHAR,
                '/', (count(*) FILTER (n >= 5))::VARCHAR,
                ', worst ', coalesce(max(CASE WHEN rk = 1 THEN grp END), '∅'),
                ': null_rate=',
                max(CASE WHEN rk = 1 THEN round(m, 6) END)::VARCHAR)
       ELSE
         concat('groups=', (count(*) FILTER (n >= 5))::VARCHAR,
                ', breaching=0')
       END AS observed,
       'null_rate in [-inf, 0.1] per event_type' AS expected
FROM flagged GROUP BY part
"""


def q_drift_events_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    spec = DriftColumn("value", 0.0, 100.0, 20)
    raw = ev.filter(F.col("event_type") == "click").withColumn("part", F.lit("*"))
    cur = ev.filter(F.col("event_type") == "view").withColumn("part", F.lit("*"))
    d = two_sample_drift(raw, cur, spec)
    return d.select(
        F.round("ks_d", 6).alias("ks_d"),
        F.round("ks_threshold", 6).alias("ks_threshold"),
        F.round("psi", 6).alias("psi"),
        F.col("n").alias("n"),
        F.col("m").alias("m"),
        F.when(F.col("ks_d") <= F.col("ks_threshold"), F.lit("PASS"))
        .otherwise(F.lit("FAIL"))
        .alias("ks_verdict"),
    )


SQL_DRIFT_EVENTS = _drift_sql(
    "SELECT value FROM events WHERE event_type = 'click'",
    "SELECT value FROM events WHERE event_type = 'view'",
    "value",
    0.0,
    100.0,
    20,
)


def q_drift_cross_run_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-RUN drift (B18/B19 over persisted B9 arrays): the two
    'runs' are profiled independently — each side reduces to its
    stats frame with a stored bucket-count array — and KS/PSI come
    from drift_from_stats with NO rescan of either source. The oracle
    computes the same drift directly from the rows: factoring through
    the stored histograms must be value-invisible."""
    from bigdime_spark.operators.drift import drift_from_stats
    from bigdime_spark.operators.stats import histogram_frames

    o = _t(spark, sf_dir, "orders")

    def run_stats(status: str) -> DataFrame:
        return histogram_frames(
            o.filter(F.col("o_orderstatus") == status).withColumn("part", F.lit("*")),
            [("o_totalprice", 900.0, 600000.0, 64)],
        )

    d = drift_from_stats(run_stats("O"), run_stats("F"))
    return d.select(
        F.round("ks_d", 6).alias("ks_d"),
        F.round("ks_threshold", 6).alias("ks_threshold"),
        F.round("psi", 6).alias("psi"),
        F.col("n").alias("n"),
        F.col("m").alias("m"),
        F.when(F.col("ks_d") <= F.col("ks_threshold"), F.lit("PASS"))
        .otherwise(F.lit("FAIL"))
        .alias("ks_verdict"),
    )


def q_stats_outlier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part anomaly detection over a per-group stats profile
    (operators/outliers.robust_part_outliers): lineitem profiled per
    l_suppkey (row count + mean price in exact integer cents), then
    each (part, metric) scored with the Iglewicz–Hoaglin modified
    z-score over the cross-part median/MAD. The oracle replays median,
    MAD, and the 3.5 cutoff with quantile_cont — Spark's exact
    F.percentile interpolates identically. Cents arithmetic keeps the
    mean free of float-sum order nondeterminism."""
    from bigdime_spark.operators.outliers import robust_part_outliers

    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy(
        F.col("l_suppkey").cast("string").alias("part")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_rows"),
        (
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mean_cents"),
    )
    return robust_part_outliers(stats, ["n_rows", "mean_cents"])


SQL_STATS_OUTLIERS = """
WITH s AS (
  SELECT CAST(l_suppkey AS VARCHAR) AS part,
         CAST(count(*) AS DOUBLE) AS n_rows,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
           / count(*) AS mean_cents
  FROM lineitem GROUP BY 1
), melted AS (
  SELECT part, 'n_rows' AS metric, n_rows AS value FROM s
  UNION ALL
  SELECT part, 'mean_cents' AS metric, mean_cents AS value FROM s
), med AS (
  SELECT metric, quantile_cont(value, 0.5) AS med FROM melted GROUP BY 1
), dev AS (
  SELECT melted.part, melted.metric, melted.value, med.med
  FROM melted JOIN med USING (metric)
), mad AS (
  SELECT metric, quantile_cont(abs(value - med), 0.5) AS mad FROM dev GROUP BY 1
)
SELECT dev.part, dev.metric,
       round(dev.value, 6) AS value,
       round(dev.med, 6) AS med,
       round(mad.mad, 6) AS mad,
       round(0.6745 * (dev.value - dev.med) / mad.mad, 6) AS robust_z,
       CASE WHEN dev.value IS NULL THEN 'NOT_READY'
            WHEN mad.mad > 0 THEN
              CASE WHEN abs(0.6745 * (dev.value - dev.med) / mad.mad) > 3.5
                   THEN 'OUTLIER' ELSE 'OK' END
            WHEN dev.value <> dev.med THEN 'OUTLIER'
            ELSE 'OK' END AS verdict
FROM dev JOIN mad USING (metric)
"""


SQL_DRIFT_CROSS_RUN = _drift_sql(
    "SELECT o_totalprice FROM orders WHERE o_orderstatus = 'O'",
    "SELECT o_totalprice FROM orders WHERE o_orderstatus = 'F'",
    "o_totalprice",
    900.0,
    600000.0,
    64,
)


def q_drift_table_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-LEVEL drift from PER-PART stats (round-5): both runs are
    profiled per o_orderpriority partition, then the stored bucket
    arrays roll up across parts to one whole-table KS/PSI — the
    histogram analogue of the HLL roll-up. The oracle computes the
    drift directly from the unpartitioned rows: additivity of
    fixed-bin counts must make the per-part factoring value-invisible
    (same SQL as the cross-run query, which never partitioned)."""
    from bigdime_spark.operators.drift import drift_from_stats
    from bigdime_spark.operators.stats import histogram_frames

    o = _t(spark, sf_dir, "orders")

    def run_stats(status: str) -> DataFrame:
        return histogram_frames(
            o.filter(F.col("o_orderstatus") == status).withColumn(
                "part", F.col("o_orderpriority")
            ),
            [("o_totalprice", 900.0, 600000.0, 64)],
        )

    d = drift_from_stats(run_stats("O"), run_stats("F"), table_level=True)
    return d.select(
        F.round("ks_d", 6).alias("ks_d"),
        F.round("ks_threshold", 6).alias("ks_threshold"),
        F.round("psi", 6).alias("psi"),
        F.col("n").alias("n"),
        F.col("m").alias("m"),
        F.when(F.col("ks_d") <= F.col("ks_threshold"), F.lit("PASS"))
        .otherwise(F.lit("FAIL"))
        .alias("ks_verdict"),
    )


def q_quantiles_from_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles from PERSISTED histogram arrays (stats.
    quantiles_from_stats) — the quantile analogue of the cross-run
    drift: the source is never rescanned, only the per-part
    stat__<col>__hist arrays. The oracle reconstructs the same binned
    inverse ECDF directly from the rows — factoring through the
    stored histograms must be value-invisible."""
    from bigdime_spark.operators.stats import histogram_frames, quantiles_from_stats

    o = _t(spark, sf_dir, "orders")
    sf = histogram_frames(
        o.withColumn("part", F.col("o_orderstatus")),
        [("o_totalprice", 900.0, 600000.0, 64)],
    )
    return quantiles_from_stats(sf, qs=(0.25, 0.5, 0.75))


def q_quantiles_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-LEVEL quantiles from PER-PART histogram arrays: profiled
    per o_orderpriority partition, bucket counts summed across parts
    (additive) before the inverse-ECDF walk. The oracle never
    partitions — additivity must make the per-part factoring
    value-invisible (same discipline as drift_table_rollup_orders)."""
    from bigdime_spark.operators.stats import histogram_frames, quantiles_from_stats

    o = _t(spark, sf_dir, "orders")
    sf = histogram_frames(
        o.withColumn("part", F.col("o_orderpriority")),
        [("o_totalprice", 900.0, 600000.0, 64)],
    )
    return quantiles_from_stats(sf, qs=(0.25, 0.5, 0.75), table_level=True)


def _quantiles_sql(
    col: str, lo: float, hi: float, nbins: int, part_expr: str
) -> str:
    """SQL mirror of stats.quantiles_from_stats over histograms built
    with histograms.bucket_col semantics: first bucket whose cumsum
    reaches q·n, linear interpolation inside it, under/overflow clamp
    to lo/hi. Literal doubles are Python-formatted (e.g. the bucket
    width) so both engines evaluate the identical IEEE values."""
    w = (hi - lo) / nbins
    bucket = (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE CAST(floor(({col} - {lo}) / {hi - lo} * {nbins}) + 1 AS INT) END"
    )
    return f"""
WITH h AS (
  SELECT part, bucket, count(*) AS cnt FROM (
    SELECT {part_expr} AS part, {bucket} AS bucket FROM orders
  ) WHERE bucket IS NOT NULL GROUP BY 1, 2
), c AS (
  SELECT part, bucket, cnt,
         (sum(cnt) OVER (PARTITION BY part ORDER BY bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
         (sum(cnt) OVER (PARTITION BY part))::BIGINT AS n_rows
  FROM h
), sel AS (
  SELECT part, q, n_rows, bucket, cnt, cum, q * n_rows AS target
  FROM c CROSS JOIN (SELECT unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE]) AS q)
  WHERE cum >= q * n_rows
  QUALIFY row_number() OVER (PARTITION BY part, q ORDER BY bucket) = 1
)
SELECT part, '{col}' AS "column", q, n_rows,
       round(CASE WHEN bucket = 0 THEN {lo!r}::DOUBLE
                  WHEN bucket = {nbins + 1} THEN {hi!r}::DOUBLE
                  ELSE {lo!r}::DOUBLE + (bucket - 1) * {w!r}::DOUBLE
                       + ((target - (cum - cnt)) / cnt) * {w!r}::DOUBLE
             END, 6) AS quantile_est
FROM sel
"""


SQL_QUANTILES_FROM_STATS = _quantiles_sql(
    "o_totalprice", 900.0, 600000.0, 64, "o_orderstatus"
)

SQL_QUANTILES_ROLLUP = _quantiles_sql(
    "o_totalprice", 900.0, 600000.0, 64, "'*'"
)


def _drift_sql_grouped(
    source_sql_r: str, source_sql_c: str, col: str, lo: float, hi: float, nbins: int
) -> str:
    """Per-part mirror of operators/drift.two_sample_drift incl. the
    NOT_READY branch (empty side → n or m = 0 → ECDF division is NULL
    in both engines: Spark try_divide, DuckDB x/0)."""
    eps = 1.0e-6
    bucket = (
        f"CASE WHEN {col} IS NULL THEN NULL "
        f"WHEN {col} < {lo} THEN 0 "
        f"WHEN {col} >= {hi} THEN {nbins + 1} "
        f"ELSE CAST(floor(({col} - {lo}) / {hi - lo} * {nbins}) + 1 AS INT) END"
    )
    return f"""
WITH hr AS (
  SELECT part, bucket, count(*) AS cnt_r FROM (
    SELECT part, {bucket} AS bucket FROM ({source_sql_r})
  ) WHERE bucket IS NOT NULL GROUP BY 1, 2
), hc AS (
  SELECT part, bucket, count(*) AS cnt_c FROM (
    SELECT part, {bucket} AS bucket FROM ({source_sql_c})
  ) WHERE bucket IS NOT NULL GROUP BY 1, 2
), joined AS (
  SELECT COALESCE(hr.part, hc.part) AS part,
         COALESCE(hr.bucket, hc.bucket) AS bucket,
         COALESCE(cnt_r, 0) AS cnt_r,
         COALESCE(cnt_c, 0) AS cnt_c
  FROM hr FULL OUTER JOIN hc ON hr.part = hc.part AND hr.bucket = hc.bucket
), scored AS (
  SELECT part, bucket, cnt_r, cnt_c,
         sum(cnt_r) OVER (PARTITION BY part) AS n,
         sum(cnt_c) OVER (PARTITION BY part) AS m,
         (sum(cnt_r) OVER (PARTITION BY part ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_r) OVER (PARTITION BY part)) AS ecdf_r,
         (sum(cnt_c) OVER (PARTITION BY part ORDER BY bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
             / (sum(cnt_c) OVER (PARTITION BY part)) AS ecdf_c,
         (cnt_r + {eps}) / (sum(cnt_r) OVER (PARTITION BY part) + {eps} * {nbins + 2}) AS p,
         (cnt_c + {eps}) / (sum(cnt_c) OVER (PARTITION BY part) + {eps} * {nbins + 2}) AS q
  FROM joined
)
SELECT part,
       round(max(abs(ecdf_r - ecdf_c)), 6) AS ks_d,
       round(1.358 * sqrt((max(n) + max(m))::DOUBLE / (max(n) * max(m))::DOUBLE), 6) AS ks_threshold,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       max(n)::BIGINT AS n,
       max(m)::BIGINT AS m,
       CASE WHEN max(n) = 0 OR max(m) = 0 OR max(abs(ecdf_r - ecdf_c)) IS NULL THEN 'NOT_READY'
            WHEN max(abs(ecdf_r - ecdf_c)) <= 1.358 * sqrt((max(n) + max(m))::DOUBLE / (max(n) * max(m))::DOUBLE)
            THEN 'PASS' ELSE 'FAIL' END AS ks_verdict
FROM scored GROUP BY part
"""


def _drift_edge_select(d: DataFrame) -> DataFrame:
    """Shared projection for the drift edge queries — same rounding and
    the NOT_READY-first verdict chain DriftCheck uses."""
    not_ready = (F.col("n") == 0) | (F.col("m") == 0) | F.col("ks_d").isNull()
    return d.select(
        "part",
        F.round("ks_d", 6).alias("ks_d"),
        F.round("ks_threshold", 6).alias("ks_threshold"),
        F.round("psi", 6).alias("psi"),
        F.col("n"),
        F.col("m"),
        F.when(not_ready, F.lit("NOT_READY"))
        .when(F.col("ks_d") <= F.col("ks_threshold"), F.lit("PASS"))
        .otherwise(F.lit("FAIL"))
        .alias("ks_verdict"),
    )


def q_drift_not_ready_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift edge: curated side EMPTY → verdict NOT_READY (the
    reference's validator-declines-to-run outcome), never FAIL."""
    ev = _t(spark, sf_dir, "events")
    spec = DriftColumn("value", 0.0, 100.0, 20)
    raw = ev.filter(F.col("event_type") == "click").withColumn("part", F.lit("*"))
    cur = ev.filter(F.col("event_type") == "__absent__").withColumn("part", F.lit("*"))
    d = two_sample_drift(raw, cur, spec).withColumn("part", F.lit("*"))
    return _drift_edge_select(d)


SQL_DRIFT_NOT_READY = _drift_sql_grouped(
    "SELECT '*' AS part, value FROM events WHERE event_type = 'click'",
    "SELECT '*' AS part, value FROM events WHERE event_type = '__absent__'",
    "value",
    0.0,
    100.0,
    20,
)


def q_drift_multipart_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift over REAL partitions (part = l_linestatus) with a mixed
    outcome: part F compares prices against a halved distribution →
    KS FAIL; part O has an empty curated side → NOT_READY."""
    li = _t(spark, sf_dir, "lineitem")
    spec = DriftColumn("l_extendedprice", 900.0, 105000.0, 64)
    raw = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_linestatus").alias("part"), "l_extendedprice"
    )
    cur = (
        li.filter((F.col("l_returnflag") == "N") & (F.col("l_linestatus") == "F"))
        .select(
            F.col("l_linestatus").alias("part"),
            (F.col("l_extendedprice") * 0.5).alias("l_extendedprice"),
        )
    )
    return _drift_edge_select(two_sample_drift(raw, cur, spec))


SQL_DRIFT_MULTIPART = _drift_sql_grouped(
    "SELECT l_linestatus AS part, l_extendedprice FROM lineitem WHERE l_returnflag = 'A'",
    "SELECT l_linestatus AS part, l_extendedprice * 0.5 AS l_extendedprice FROM lineitem"
    " WHERE l_returnflag = 'N' AND l_linestatus = 'F'",
    "l_extendedprice",
    900.0,
    105000.0,
    64,
)


# =====================================================================
# §2.4/§2.6 window top-k + JSON scalar functions
# =====================================================================

def q_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_orderpriority", "rk", "o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice")
        )
    )


SQL_TOPK_ORDERS = """
SELECT o_orderpriority, rk, o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy(F.col("event_type").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.max(k).alias("max_k"),
        )
    )


SQL_EVENTS_JSON = """
SELECT event_type AS part,
       count(*) AS n_rows,
       round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY 1
"""


# =====================================================================
# Text analysis (documents table)
# =====================================================================

_WS_TOKENS_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


def q_token_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        ws_token_count(F.col("text")).alias("ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("bpe_tokens"),
        F.length("text").alias("char_len"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       {_WS_TOKENS_SQL} AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe_tokens,
       len(text) AS char_len
FROM documents
"""


def q_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    m = quality_metrics(F.col("text"))
    return d.select("doc_id", *[m[k].alias(k) for k in m])


def q_repetition_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (functions/text.
    repetition_metrics): duplicate-line fraction + top-bigram
    fraction, columnar per row. The oracle rebuilds lines/bigrams with
    DuckDB list comprehensions and the same distinct-vs-scan
    arithmetic."""
    from bigdime_spark.functions.text import repetition_metrics

    d = _t(spark, sf_dir, "documents")
    m = repetition_metrics(F.col("text"))
    return d.select("doc_id", *[m[k].alias(k) for k in m])


SQL_REPETITION = r"""
WITH base AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS toks
  FROM documents
), g AS (
  SELECT doc_id, lines,
         CASE WHEN len(toks) >= 2 THEN
           [toks[i] || ' ' || toks[i+1] FOR i IN generate_series(1, len(toks)-1)]
         END AS grams
  FROM base
), counts AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE grams IS NOT NULL)
  GROUP BY 1, 2
), top AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS tot FROM counts GROUP BY 1
)
SELECT g.doc_id,
       len(g.lines) AS n_lines,
       round((len(g.lines) - len(list_distinct(g.lines)))::DOUBLE
             / len(g.lines), 6) AS dup_line_frac,
       round(top.top_c::DOUBLE / top.tot::DOUBLE, 6) AS top_bigram_frac
FROM g LEFT JOIN top ON g.doc_id = top.doc_id
"""


def q_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII surface scan (functions/text.pii_metrics): per-doc match
    counts for RE2-safe email/phone/ipv4 patterns + has_pii flag. The
    oracle runs the IDENTICAL pattern strings through DuckDB's
    regexp_extract_all — pattern portability is the test."""
    from bigdime_spark.functions.text import pii_metrics

    d = _t(spark, sf_dir, "documents")
    m = pii_metrics(F.col("text"))
    return d.select("doc_id", *[m[k].alias(k) for k in m])


def _pii_sql() -> str:
    from bigdime_spark.functions.text import PII_PATTERNS

    cols = ",\n       ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(f"len(regexp_extract_all(text, '{pat}'))"
                       for pat in PII_PATTERNS.values())
    return f"SELECT doc_id,\n       {cols},\n       ({total}) > 0 AS has_pii\nFROM documents"


SQL_PII = _pii_sql()


_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS) + "]"
# PUNCT_CLASS contains a single quote; double it for the SQL literal
_PUNCT_SQL = PUNCT_CLASS.replace("'", "''").replace('\\"', '"')
SQL_QUALITY = f"""
WITH feat AS (
  SELECT doc_id,
         {_WS_TOKENS_SQL} AS n_tokens,
         len(text) AS n_chars,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> list_contains({_STOPLIST_SQL}, lower(x)))) AS sw,
         len(text) - len(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS pc,
         len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS dc,
         len(regexp_replace(trim(text), '\\s+', '', 'g')) AS nonws_chars
  FROM documents
), ratios AS (
  SELECT doc_id, n_tokens,
         round(CASE WHEN n_tokens = 0 THEN NULL ELSE nonws_chars::DOUBLE / n_tokens END, 6) AS avg_word_len,
         round(CASE WHEN n_tokens = 0 THEN NULL ELSE sw::DOUBLE / n_tokens END, 6) AS stopword_ratio,
         round(CASE WHEN n_chars = 0 THEN NULL ELSE pc::DOUBLE / n_chars END, 6) AS punct_ratio,
         round(CASE WHEN n_chars = 0 THEN NULL ELSE dc::DOUBLE / n_chars END, 6) AS digit_ratio
  FROM feat
)
SELECT doc_id, n_tokens, avg_word_len, stopword_ratio, punct_ratio, digit_ratio,
       round(greatest(0.0, least(1.0,
             0.5 * least(n_tokens::DOUBLE / 64.0, 1.0) + 0.5
             - COALESCE(punct_ratio, 0.0) * 2.0
             - COALESCE(digit_ratio, 0.0))), 6) AS quality_score
FROM ratios
"""


SQL_CAPTION_QUALITY = f"""
WITH feat AS (
  SELECT concat('p', (doc_id % 4)::VARCHAR) AS part,
         {_WS_TOKENS_SQL} AS n_tokens,
         len(text) AS n_chars,
         len(text) - len(regexp_replace(text, '{_PUNCT_SQL}', '', 'g')) AS pc,
         len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS dc
  FROM documents
), ratios AS (
  SELECT part, n_tokens,
         round(CASE WHEN n_chars = 0 THEN NULL ELSE pc::DOUBLE / n_chars END, 6) AS punct_ratio,
         round(CASE WHEN n_chars = 0 THEN NULL ELSE dc::DOUBLE / n_chars END, 6) AS digit_ratio
  FROM feat
), scored AS (
  SELECT part, n_tokens,
         round(greatest(0.0, least(1.0,
               0.5 * least(n_tokens::DOUBLE / 64.0, 1.0) + 0.5
               - COALESCE(punct_ratio, 0.0) * 2.0
               - COALESCE(digit_ratio, 0.0))), 6) AS quality_score
  FROM ratios
), agg AS (
  SELECT part, avg(quality_score) AS mq, avg(n_tokens::DOUBLE) AS mt
  FROM scored GROUP BY part
)
SELECT part,
       round(mq, 6) AS mean_quality,
       round(mt, 6) AS mean_tokens,
       CASE WHEN mq IS NULL THEN 'NOT_READY'
            WHEN mq >= 0.2 THEN 'PASS' ELSE 'FAIL' END AS verdict_quality,
       CASE WHEN mt IS NULL THEN 'NOT_READY'
            WHEN mt >= 1.0 AND mt <= 500.0 THEN 'PASS'
            ELSE 'FAIL' END AS verdict_tokens,
       concat('mean_quality_score=',
              coalesce(round(mq, 6)::VARCHAR, 'null')) AS observed_quality,
       'mean_n_tokens in [1.0, 500.0]' AS expected_tokens
FROM agg
"""


def q_caption_lang_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption language-mix gate (round-5, C76): per-part share of
    captions predicted en / und by the C13 marker heuristic, with
    declared bounds evaluated through the fused-agg path
    (operators/caption.CaptionLangShareBound). Fixture: documents.text
    as the caption, part = doc_id % 4. The oracle replays the marker
    argmax, the share arithmetic and both verdict folds."""
    from bigdime_spark.operators.base import fused_agg_exprs
    from bigdime_spark.operators.caption import CaptionLangShareBound

    d = _t(spark, sf_dir, "documents").select(
        F.concat(F.lit("p"), (F.col("doc_id") % 4).cast("string")).alias("part"),
        F.col("text").alias("caption"),
    )
    b_en = CaptionLangShareBound("en", lo=0.5)
    b_und = CaptionLangShareBound("und", hi=0.4)
    fused = d.groupBy("part").agg(*fused_agg_exprs([b_en, b_und]))
    return fused.select(
        "part",
        F.round(b_en._share(), 6).alias("share_en"),
        F.round(b_und._share(), 6).alias("share_und"),
        b_en.verdict_col().alias("verdict_en"),
        b_und.verdict_col().alias("verdict_und"),
        b_und.observed_col().alias("observed_und"),
        b_en.expected_col().alias("expected_en"),
    )


def q_langid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    s = lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        predicted_lang(F.col("text")).alias("pred_lang"),
        *[s[lang].alias(f"score_{lang}") for lang in ("en", "de", "fr", "es")],
    )


def _marker_sql(lang: str) -> str:
    lits = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
    return (
        f"len(list_filter(string_split_regex(trim(text), '\\s+'), "
        f"x -> list_contains([{lits}], lower(x))))"
    )


SQL_LANGID = f"""
WITH s AS (
  SELECT doc_id,
         {_marker_sql('en')} AS score_en,
         {_marker_sql('de')} AS score_de,
         {_marker_sql('fr')} AS score_fr,
         {_marker_sql('es')} AS score_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN score_en + score_de + score_fr + score_es = 0 THEN 'und'
            WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
            WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
            WHEN score_fr >= score_es THEN 'fr'
            ELSE 'es' END AS pred_lang,
       score_en, score_de, score_fr, score_es
FROM s
"""


SQL_CAPTION_LANG = f"""
WITH s AS (
  SELECT concat('p', (doc_id % 4)::VARCHAR) AS part,
         {_marker_sql('en')} AS score_en,
         {_marker_sql('de')} AS score_de,
         {_marker_sql('fr')} AS score_fr,
         {_marker_sql('es')} AS score_es
  FROM documents WHERE text IS NOT NULL
), pred AS (
  SELECT part,
         CASE WHEN score_en + score_de + score_fr + score_es = 0 THEN 'und'
              WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es THEN 'en'
              WHEN score_de >= score_fr AND score_de >= score_es THEN 'de'
              WHEN score_fr >= score_es THEN 'fr'
              ELSE 'es' END AS lang
  FROM s
), agg AS (
  SELECT part,
         (count(*) FILTER (lang = 'en'))::DOUBLE / count(*) AS sh_en,
         (count(*) FILTER (lang = 'und'))::DOUBLE / count(*) AS sh_und
  FROM pred GROUP BY part
)
SELECT part,
       round(sh_en, 6) AS share_en,
       round(sh_und, 6) AS share_und,
       CASE WHEN sh_en IS NULL THEN 'NOT_READY'
            WHEN sh_en >= 0.5 AND sh_en <= 1.0 THEN 'PASS' ELSE 'FAIL' END AS verdict_en,
       CASE WHEN sh_und IS NULL THEN 'NOT_READY'
            WHEN sh_und >= 0.0 AND sh_und <= 0.4 THEN 'PASS' ELSE 'FAIL' END AS verdict_und,
       concat('share_und=', coalesce(round(sh_und, 6)::VARCHAR, 'null')) AS observed_und,
       'share_en in [0.5, 1.0]' AS expected_en
FROM agg
"""


def q_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r6 note: an explode(window)+groupBy(min) rewrite was measured
    # SLOWER in the frozen bench (0.40 s → 1.31 s at sf0.1): with the
    # _t input spread in place the per-row HOF fold is shuffle-free,
    # while the rewrite pays a 5M-row explode + exchange. Reverted —
    # kept as the per-row Column form.
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_col(F.col("text"), 8).alias("fp"))


SQL_FINGERPRINT = """
SELECT doc_id, min(md5(substr(text, i, 8))) AS fp
FROM (SELECT doc_id, text,
             unnest(generate_series(1, greatest(len(text) - 7, 1))) AS i
      FROM documents)
GROUP BY doc_id
"""


def q_rolling_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_hash_col(F.col("text"), 8).alias("rfp"))


# Σ ascii(ch_j) · 257^(8−j) mod 1e9+7 per window, min over windows.
_POWERS = [257 ** (7 - j) for j in range(8)]
_POLY = " + ".join(
    f"ascii(substr(text, i + {j}, 1))::HUGEINT * {p}::HUGEINT" for j, p in enumerate(_POWERS)
)
SQL_ROLLING_FINGERPRINT = f"""
WITH windows AS (
  SELECT doc_id, text, unnest(generate_series(1, greatest(len(text) - 7, 1))) AS i
  FROM documents
), hashes AS (
  SELECT doc_id, CAST(({_POLY}) % 1000000007 AS BIGINT) AS hv FROM windows
)
SELECT doc_id, min(hv) AS rfp FROM hashes GROUP BY doc_id
"""


def q_bit_balance_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-degeneracy detector (operators/bitbalance.bit_balance):
    per-bit set fractions of an int64 fingerprint, per source
    partition. The fingerprint here is the md5-portable 40-bit hash
    of the text scanned over 48 bit positions — bits 40-47 are
    structurally stuck at 0, so the query demonstrates detection on
    real degeneracy while every row stays value-exact vs DuckDB. The
    production form runs over the image table's full-width phash via
    the suite's --bit-balance constraint."""
    from bigdime_spark.operators.bitbalance import bit_balance

    d = _t(spark, sf_dir, "documents")
    hv = F.conv(F.substring(F.md5("text"), 1, 10), 16, 10).cast("long")
    return bit_balance(
        d.select(F.col("source").alias("part"), hv.alias("hv")),
        "hv",
        "part",
        n_bits=48,
    )


_BB_DIGITS = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (9 - i)}::BIGINT"
    for i in range(10)
)
SQL_BIT_BALANCE = f"""
WITH hv AS (
  SELECT source AS part, ({_BB_DIGITS}) AS x
  FROM (SELECT source, md5(text) AS h FROM documents)
), bits AS (
  SELECT part, x, unnest(generate_series(0, 47)) AS bit FROM hv
)
SELECT part, bit,
       count(x) AS n_rows,
       CAST(coalesce(sum((x >> CAST(bit AS INT)) & 1), 0) AS BIGINT) AS n_set,
       round(coalesce(sum((x >> CAST(bit AS INT)) & 1), 0) / count(x), 6) AS frac
FROM bits GROUP BY 1, 2
"""


# =====================================================================
# Deduplication (documents table)
# =====================================================================

def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dup_ids is the bounded member sample (MAX_GROUP_IDS smallest
    ids) — projected as a csv string so the oracle compare is
    format-stable across engines."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dup_groups(d, "doc_id", ["text"]).select(
        "content_hash",
        "n_copies",
        "keeper",
        F.array_join(
            F.transform("dup_ids", lambda x: x.cast("string")), ","
        ).alias("dup_ids_csv"),
    )


SQL_DEDUP_EXACT = f"""
WITH t AS (
  SELECT md5(text) AS content_hash, doc_id,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM documents
)
SELECT content_hash, count(*) AS n_copies, min(doc_id) AS keeper,
       array_to_string(
         list_transform(
           list_sort(list(doc_id) FILTER (rn <= {dedup.MAX_GROUP_IDS})),
           x -> x::VARCHAR),
         ',') AS dup_ids_csv
FROM t GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_exact_bounded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded member-sample logic exercised against REAL dup
    groups larger than the cap: events.user_id has ~150 groups of up
    to hundreds of copies; with max_ids=5 the counts stay exact while
    dup_ids keeps only the 5 smallest event_ids — value-checked
    against the DuckDB row_number FILTER twin."""
    ev = (
        _t(spark, sf_dir, "events")
        .select("event_id", F.col("user_id").cast("string").alias("uid"))
        # no-op on current testdata, but Spark md5(concat_ws) maps NULL
        # to md5('') while DuckDB md5(NULL) is NULL — keep NULL keys
        # out of BOTH sides so a future fixture with null user_ids
        # cannot silently diverge the oracle
        .filter(F.col("uid").isNotNull())
    )
    return dedup.exact_dup_groups(ev, "event_id", ["uid"], max_ids=5).select(
        "content_hash",
        "n_copies",
        "keeper",
        F.array_join(
            F.transform("dup_ids", lambda x: x.cast("string")), ","
        ).alias("dup_ids_csv"),
    )


SQL_DEDUP_EXACT_BOUNDED = """
WITH t AS (
  SELECT md5(user_id::VARCHAR) AS content_hash, event_id,
         row_number() OVER (
           PARTITION BY md5(user_id::VARCHAR) ORDER BY event_id
         ) AS rn
  FROM events WHERE user_id IS NOT NULL
)
SELECT content_hash, count(*) AS n_copies, min(event_id) AS keeper,
       array_to_string(
         list_transform(
           list_sort(list(event_id) FILTER (rn <= 5)), x -> x::VARCHAR),
         ',') AS dup_ids_csv
FROM t GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_dedup(
        d, "doc_id", "text", ngram=3, num_hashes=16, bands=4, threshold=0.5, hash_mode="md5"
    )


def _minhash_sql(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    rows = num_hashes // bands
    mh_aggs = ",\n         ".join(
        f"min(md5('{i}|' || g)) AS mh_{i}" for i in range(num_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT id, {b} AS band, md5({key}) AS bkey FROM sigs".format(
            b=b,
            key=" || '|' || ".join(f"mh_{b * rows + r}" for r in range(rows)),
        )
        for b in range(bands)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS t FROM documents
), sh AS (
  SELECT id, g FROM (
    SELECT id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                FOR i IN generate_series(1, greatest(len(t) - 2, 1))])) AS g
    FROM toks
  ) WHERE g <> ''
), sigs AS (
  SELECT id,
         {mh_aggs},
         count(*) AS set_size
  FROM sh GROUP BY id
), banded_all AS (
{band_selects}
), bucket_ok AS (
  SELECT band, bkey FROM banded_all GROUP BY 1, 2 HAVING count(*) <= 1000
), banded AS (
  SELECT banded_all.* FROM banded_all SEMI JOIN bucket_ok USING (band, bkey)
), cand AS (
  SELECT DISTINCT l.id AS id1, r.id AS id2
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.bkey = r.bkey AND l.id < r.id
), inter AS (
  SELECT c.id1, c.id2, count(*) AS inter
  FROM cand c
  JOIN sh a ON a.id = c.id1
  JOIN sh b ON b.id = c.id2 AND b.g = a.g
  GROUP BY 1, 2
), scored AS (
  SELECT i.id1, i.id2,
         round(i.inter::DOUBLE / (s1.set_size + s2.set_size - i.inter)::DOUBLE, 6) AS jaccard
  FROM inter i
  JOIN sigs s1 ON s1.id = i.id1
  JOIN sigs s2 ON s2.id = i.id2
)
SELECT id1, id2, jaccard FROM scored WHERE jaccard >= {threshold}
"""


SQL_DEDUP_MINHASH = _minhash_sql()


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash(d, "doc_id", "text", bits=16).withColumnRenamed("id", "doc_id")


def _simhash_sql(bits: int = 16) -> str:
    votes = []
    for b in range(bits):
        digit = f"(strpos('{HEX}', substr(h, {b // 4 + 1}, 1)) - 1)"
        bit = f"(({digit} // {1 << (b % 4)}) % 2)"
        votes.append(f"sum(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS v_{b}")
    votes_sql = ",\n         ".join(votes)
    fold = " + ".join(f"CASE WHEN v_{b} >= 0 THEN {1 << b}::BIGINT ELSE 0::BIGINT END" for b in range(bits))
    return f"""
WITH tok AS (
  -- trim(text)='' guard mirrors Spark's tokens_col (empty array, no
  -- rows): DuckDB's string_split_regex('') would otherwise yield ['']
  SELECT doc_id AS id, md5(unnest(string_split_regex(trim(text), '\\s+'))) AS h
  FROM documents WHERE trim(text) <> ''
), agg AS (
  SELECT id,
         {votes_sql}
  FROM tok GROUP BY id
)
SELECT id AS doc_id, ({fold}) AS simhash FROM agg
"""


SQL_DEDUP_SIMHASH = _simhash_sql()


def q_dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 3 via pigeonhole banding
    (4 disjoint 4-bit chunks of the 16-bit fingerprint; a qualifying
    pair must agree on ≥1 chunk) + exact bit_count(xor) verify."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(d, "doc_id", "text", bits=16, k=3)


def _hex_to_int_sql(expr: str, nchars: int) -> str:
    """First ``nchars`` hex digits of ``expr`` as an integer — DuckDB
    has no hex→int conv, so rebuild digit by digit (same trick as the
    checksum oracle)."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ) + ")"


def _banded_hamming_sql(
    fp_cte: str, fp_col: str, bits: int, k: int, max_bucket: int | None = None
) -> str:
    """Pigeonhole band join over a non-negative int fingerprint CTE
    ``fp`` with columns (id, <fp_col>) — mirrors
    dedup.hamming_pairs_on_column 1:1 (integer // and % replay the
    shift+mask chunking exactly because the fingerprint is
    non-negative in every oracle query). ``max_bucket`` replays the
    degenerate-bucket drop."""
    from bigdime_spark.operators.dedup import _hamming_chunks

    bands = "\n  UNION ALL\n".join(
        f"  SELECT id, {fp_col}, {i} AS ck,"
        f" (({fp_col} // {1 << off}) % {1 << w}) AS cv FROM fp"
        for i, (off, w) in enumerate(_hamming_chunks(bits, k))
    )
    cap = ""
    banded_src = "banded0"
    if max_bucket is not None:
        cap = f""", sizes AS (
  SELECT ck, cv, count(*) AS bn FROM banded0 GROUP BY 1, 2
), banded AS (
  SELECT b.* FROM banded0 b JOIN sizes s USING (ck, cv) WHERE s.bn <= {max_bucket}
)"""
        banded_src = "banded"
    return f"""
WITH fp AS ({fp_cte}),
banded0 AS (
{bands}
){cap}, cand AS (
  SELECT DISTINCT l.id AS id1, r.id AS id2,
         CAST(bit_count(xor(l.{fp_col}, r.{fp_col})) AS INT) AS hamming
  FROM {banded_src} l JOIN {banded_src} r ON l.ck = r.ck AND l.cv = r.cv AND l.id < r.id
)
SELECT id1, id2, hamming FROM cand WHERE hamming <= {k}
"""


def _simhash_hamming_sql(bits: int = 16, k: int = 3, max_bucket: int | None = None) -> str:
    # wrap (no string surgery on the generated SQL): expose doc_id as id
    fp = f"SELECT doc_id AS id, simhash FROM ({_simhash_sql(bits)})"
    return _banded_hamming_sql(fp, "simhash", bits, k, max_bucket)


SQL_DEDUP_SIMHASH_HAMMING = _simhash_hamming_sql()


def q_dedup_simhash_hamming_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented web-scale simhash recipe, oracle-checked: WIDE
    fingerprint (24 bits → 6-bit pigeonhole chunks at k=3) with the
    degenerate-bucket cap ENGAGED (max_bucket=10 — small enough to
    genuinely drop buckets at sf0.01, proving the capped path, not
    just the uncapped 16-bit oracle form)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(d, "doc_id", "text", bits=24, k=3, max_bucket=10)


SQL_DEDUP_SIMHASH_HAMMING_WIDE = _simhash_hamming_sql(bits=24, k=3, max_bucket=10)


def q_dedup_phash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup search directly on an EXISTING int64 perceptual-hash
    column (the image table's ``phash`` axis, BASELINE.json:15) — no
    tokenization, just the pigeonhole band join. The oracle-portable
    fingerprint is md5-derived (16 bits) so DuckDB replays it
    bit-identically; the engine path is identical for the real 64-bit
    phash (hamming_pairs_on_column(bits=64), exercised against the
    synthetic image fixture in pytest)."""
    d = _t(spark, sf_dir, "documents")
    ph = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    return dedup.hamming_pairs_on_column(ph, "doc_id", "phash", bits=16, k=2)


SQL_DEDUP_PHASH_HAMMING = _banded_hamming_sql(
    f"SELECT doc_id AS id, {_hex_to_int_sql('md5(doc_id::VARCHAR)', 4)} AS phash FROM documents",
    "phash",
    16,
    2,
)


def q_dedup_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: connected components over the phash candidate
    pairs (transitive closure — A~B, B~C is ONE boilerplate cluster),
    exact member counts, members sampled at 10. The DuckDB twin walks
    the same graph with a recursive reachability CTE and takes
    min-reachable-id as the component label — the same fixpoint the
    min-label propagation converges to."""
    d = _t(spark, sf_dir, "documents")
    ph = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    pairs = dedup.hamming_pairs_on_column(ph, "doc_id", "phash", bits=16, k=2)
    clusters = dedup.near_dup_clusters(pairs, max_ids=10)
    return clusters.select(
        "component",
        "n_members",
        F.array_join(
            F.transform("members", lambda x: x.cast("string")), ","
        ).alias("members_csv"),
    )


SQL_DEDUP_PHASH_CLUSTERS = f"""
WITH RECURSIVE pairs AS (
{SQL_DEDUP_PHASH_HAMMING}
), edges AS (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION
  SELECT id2 AS src, id1 AS dst FROM pairs
), reach(src, node) AS (
  SELECT src, src AS node FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst AS node FROM reach r JOIN edges e ON r.node = e.src
), cc AS (
  SELECT src AS id, min(node) AS component FROM reach GROUP BY 1
), ranked AS (
  SELECT id, component,
         row_number() OVER (PARTITION BY component ORDER BY id) AS rn
  FROM cc
)
SELECT component, count(*) AS n_members,
       array_to_string(
         list_transform(list_sort(list(id) FILTER (rn <= 10)), x -> x::VARCHAR),
         ',') AS members_csv
FROM ranked GROUP BY 1
"""


def q_dedup_phash_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME clusters via the alternating large-star/small-star
    contraction (operators/dedup.connected_components_star) — both
    components strategies must land on the identical min-id-rooted
    fixpoint, so this query shares the label-propagation query's
    recursive-CTE oracle verbatim."""
    d = _t(spark, sf_dir, "documents")
    ph = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    pairs = dedup.hamming_pairs_on_column(ph, "doc_id", "phash", bits=16, k=2)
    clusters = dedup.near_dup_clusters(pairs, max_ids=10, algo="star")
    return clusters.select(
        "component",
        "n_members",
        F.array_join(
            F.transform("members", lambda x: x.cast("string")), ","
        ).alias("members_csv"),
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", block_col="source", k=8, threshold=0.2
    )


SQL_NGRAM_JACCARD = """
WITH sh AS (
  SELECT id, blk, g FROM (
    SELECT doc_id AS id, source AS blk,
           unnest(list_distinct([substr(text, i, 8)
                   FOR i IN generate_series(1, greatest(len(text) - 7, 1))])) AS g
    FROM documents
  )
), sizes AS (
  SELECT id, count(*) AS sz FROM sh GROUP BY 1
), inter AS (
  SELECT a.id AS id1, b.id AS id2, count(*) AS inter
  FROM sh a JOIN sh b ON a.blk = b.blk AND a.g = b.g AND a.id < b.id
  GROUP BY 1, 2
), scored AS (
  SELECT id1, id2,
         round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) AS jaccard
  FROM inter JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
)
SELECT id1, id2, jaccard FROM scored WHERE jaccard >= 0.2
"""


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C61 asymmetric containment near-dup
    (operators/dedup.containment_pairs): directed C(A→B) = |A∩B|/|A|
    over word 3-gram shingles, prefix-filtered candidates (lossless
    pigeonhole — no LSH recall gap for the high-containment/
    low-Jaccard population this exists for). Fixture plants the
    asymmetry the operator hunts: every doc_id % 5 == 0 document
    contributes a 10-token excerpt twin (id + 1,000,000) whose gram
    set is a strict subset of its source — containment 1.0 toward the
    source at a Jaccard far below any C2/C5 threshold. The oracle
    replays shingling, the hot-gram valve and the exact intersection
    arithmetic over ALL gram-sharing pairs, so the prefix filter's
    losslessness is itself under test."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    exc = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 10), " "
        ).alias("text"),
    )
    return dedup.containment_pairs(
        d.unionByName(exc),
        "doc_id",
        "text",
        ngram=3,
        threshold=0.8,
        max_gram_docs=1000,
    )


SQL_DEDUP_CONTAINMENT = r"""
WITH docs AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(regexp_split_to_array(trim(text), '\s+')[1:10], ' ')
  FROM documents WHERE doc_id % 5 = 0
), toks AS (
  SELECT id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM docs
), gr AS (
  SELECT id,
         list_filter(list_distinct([array_to_string(t[i:i+2], ' ')
             FOR i IN generate_series(1, greatest(len(t) - 2, 1))]),
             g -> g <> '') AS gs
  FROM toks
), sh0 AS (
  SELECT id, unnest(gs) AS gram FROM gr
), hot AS (
  SELECT gram FROM (SELECT gram, count(*) AS nd FROM sh0 GROUP BY 1)
  WHERE nd > 1000
), sh AS (
  SELECT * FROM sh0 WHERE gram NOT IN (SELECT gram FROM hot)
), sizes AS (
  SELECT id, count(*) AS sz FROM sh GROUP BY 1
), inter AS (
  SELECT a.id AS id1, b.id AS id2, count(*) AS inter
  FROM sh a JOIN sh b ON a.gram = b.gram AND a.id <> b.id
  GROUP BY 1, 2
), scored AS (
  SELECT id1, id2, inter, s1.sz AS size1, s2.sz AS size2,
         round(inter::DOUBLE / s1.sz::DOUBLE, 6) AS containment,
         round(inter::DOUBLE / (s1.sz + s2.sz - inter)::DOUBLE, 6) AS jaccard
  FROM inter JOIN sizes s1 ON s1.id = id1 JOIN sizes s2 ON s2.id = id2
)
SELECT * FROM scored WHERE containment >= 0.8
"""


def q_dedup_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C64 multi-signal consensus (operators/dedup.consensus_pairs):
    a pair is a duplicate when ≥2 of {SimHash hamming≤3, MinHash-LSH
    jaccard≥0.5, 8-gram Jaccard≥0.2} agree — same parameters as each
    signal's own contract query. At sf0.01 the SimHash signal alone
    carries 16k+ random-collision pairs and the consensus keeps 25:
    the noise-rejection property is itself under oracle test, and one
    pair survives with all three votes."""
    from bigdime_spark.operators.dedup import consensus_pairs

    d = _t(spark, sf_dir, "documents")
    return consensus_pairs(
        {
            "simhash": dedup.simhash_hamming_pairs(d, "doc_id", "text", bits=16, k=3),
            "minhash": dedup.minhash_lsh_dedup(
                d, "doc_id", "text", ngram=3, num_hashes=16, bands=4,
                threshold=0.5, hash_mode="md5",
            ),
            "jaccard": dedup.ngram_jaccard_pairs(
                d, "doc_id", "text", block_col="source", k=8, threshold=0.2
            ),
        },
        min_votes=2,
    )


def _consensus_sql() -> str:
    """The oracle replays every signal's own oracle verbatim as a
    derived table, canonicalizes orientation, and votes — so a drift
    in ANY signal's semantics breaks this query too."""
    return f"""
WITH votes AS (
  SELECT DISTINCT least(id1, id2) AS id1, greatest(id1, id2) AS id2,
         'simhash' AS signal
  FROM ({SQL_DEDUP_SIMHASH_HAMMING}) s
  UNION
  SELECT DISTINCT least(id1, id2), greatest(id1, id2), 'minhash'
  FROM ({SQL_DEDUP_MINHASH}) m
  UNION
  SELECT DISTINCT least(id1, id2), greatest(id1, id2), 'jaccard'
  FROM ({SQL_NGRAM_JACCARD}) j
)
SELECT id1, id2, count(*) AS n_signals,
       string_agg(signal, ',' ORDER BY signal) AS signals_csv
FROM votes GROUP BY 1, 2 HAVING count(*) >= 2
"""


def _caption_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic image+caption frame for the C62 queries: phash
    groups from doc_id % 37, captions from doc_id % 11 EXCEPT groups
    0-4 which are single-caption (so the conflict filter has clean
    groups to exclude), NULLs planted on doc_id % 97 (so the
    NULL-counts-as-a-conflicting-label rule is under oracle test —
    group 4 is clean by construction but conflicted by its planted
    NULL)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    return d.select(
        F.col("doc_id").alias("image_id"),
        (F.col("doc_id") % 37).alias("phash"),
        F.when(F.col("doc_id") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("cap"),
                F.when(
                    F.col("doc_id") % 37 < 5, F.col("doc_id") % 37
                )
                .otherwise(F.col("doc_id") % 11)
                .cast("string"),
            )
        )
        .alias("caption"),
    )


_CAPTION_FIXTURE_SQL = """
  SELECT doc_id AS image_id, doc_id % 37 AS phash,
         CASE WHEN doc_id % 97 = 0 THEN NULL
              ELSE 'cap' || CAST(CASE WHEN doc_id % 37 < 5
                                      THEN doc_id % 37
                                      ELSE doc_id % 11 END AS VARCHAR)
         END AS caption
  FROM documents
"""


def q_caption_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C62a label-noise detector
    (operators/caption.conflicting_caption_groups): copies of one
    image (same phash) carrying more than one caption — conflicting
    supervision. The window-bounded sample, the exact counts, the
    NULL-label rule and the >1/>1 filter all replay in DuckDB."""
    from bigdime_spark.operators.caption import conflicting_caption_groups

    out = conflicting_caption_groups(
        _caption_fixture(spark, sf_dir), max_ids=5
    )
    return out.select(
        "phash",
        "n_rows",
        "n_captions",
        F.array_join(
            F.transform("sample_ids", lambda x: x.cast("string")), ","
        ).alias("sample_ids_csv"),
    )


SQL_CAPTION_CONFLICTS = f"""
WITH img AS (
{_CAPTION_FIXTURE_SQL}
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY phash ORDER BY image_id) AS rn
  FROM img WHERE phash IS NOT NULL
), g AS (
  SELECT phash, count(*) AS n_rows,
         count(DISTINCT caption)
           + max(CASE WHEN caption IS NULL THEN 1 ELSE 0 END) AS n_captions,
         array_to_string(
           list_transform(list_sort(list(image_id) FILTER (rn <= 5)),
                          x -> x::VARCHAR), ',') AS sample_ids_csv
  FROM ranked GROUP BY 1
)
SELECT * FROM g WHERE n_rows > 1 AND n_captions > 1
"""


def q_caption_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C62b stock-caption detector
    (operators/caption.stock_caption_groups): one caption across ≥
    min_images DISTINCT images (phash-distinct, so exact re-uploads
    cannot inflate a caption into "stock"). NULL captions/phashes
    excluded — both rules replayed in DuckDB."""
    from bigdime_spark.operators.caption import stock_caption_groups

    return stock_caption_groups(
        _caption_fixture(spark, sf_dir).withColumn(
            "phash", F.col("image_id") % 201
        ),
        min_images=40,
    )


SQL_CAPTION_STOCK = f"""
WITH img0 AS (
{_CAPTION_FIXTURE_SQL}
), img AS (
  SELECT image_id, image_id % 201 AS phash, caption FROM img0
)
SELECT caption, count(*) AS n_rows, count(DISTINCT phash) AS n_images
FROM img WHERE caption IS NOT NULL AND phash IS NOT NULL
GROUP BY 1 HAVING count(DISTINCT phash) >= 40
"""


def q_contamination_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/decontam.contamination_scan):
    docs sharing word n-grams with a held-out benchmark set. The
    deterministic `doc_id % 97 == 0` slice plays the benchmark; the
    rest is the corpus. n=3 keeps the overlap non-degenerate on the
    synthetic corpus (production default is 8–13-gram); the corpus
    side never shuffles (benchmark grams broadcast), and the sample
    column is the bounded 10-smallest matched grams."""
    from bigdime_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corp = d.filter(F.col("doc_id") % 97 != 0)
    return decontam.contamination_scan(corp, bench, n=3)


SQL_CONTAMINATION = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents
), gr AS (
  SELECT doc_id,
         list_filter(list_distinct([array_to_string(t[i:i+2], ' ')
             FOR i IN generate_series(1, greatest(len(t) - 2, 1))]),
             g -> g <> '') AS gs
  FROM toks
), bench AS (
  SELECT DISTINCT unnest(gs) AS g FROM gr WHERE doc_id % 97 = 0
), corp AS (
  SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS g
  FROM gr WHERE doc_id % 97 <> 0
), hits AS (
  SELECT doc_id, n_grams, count(*) AS n_hits,
         array_to_string(list_sort(list(g))[1:10], ',') AS sample_grams_csv
  FROM corp JOIN bench USING (g)
  GROUP BY 1, 2
)
SELECT doc_id, n_grams, n_hits,
       round(n_hits::DOUBLE / n_grams, 6) AS hit_fraction,
       sample_grams_csv
FROM hits WHERE n_hits >= 1
"""


def q_phash_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-corpus eval-set decontamination
    (operators/decontam.phash_contamination): corpus rows whose
    perceptual hash lands within hamming ≤ 2 of ANY eval-set image.
    The oracle-portable fingerprint is the same md5-derived 16-bit
    int as dedup_phash_hamming; the eval set is the deterministic
    `doc_id % 11 == 0` slice with its fingerprint XOR-perturbed by
    doc_id % 4 → {0, 1, 3, 7} set bits — so exact matches, hamming-1,
    hamming-2 (all flagged) and hamming-3 (excluded at k=2) are ALL
    exercised, putting the ≤k boundary itself under oracle test. The
    engine path is identical for the real 64-bit phash (bits=64,
    pytest on the synthetic image fixture)."""
    from bigdime_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long")
        .alias("phash"),
    )
    flips = (
        F.when(F.col("doc_id") % 4 == 0, 0)
        .when(F.col("doc_id") % 4 == 1, 1)
        .when(F.col("doc_id") % 4 == 2, 3)
        .otherwise(7)
        .cast("long")
    )
    ev = corpus.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", F.col("phash").bitwiseXOR(flips).alias("phash")
    )
    return decontam.phash_contamination(
        corpus, ev, id_col="doc_id", phash_col="phash", bits=16, k=2
    )


def _phash_contamination_sql() -> str:
    from bigdime_spark.operators.dedup import _hamming_chunks

    fp = _hex_to_int_sql("md5(doc_id::VARCHAR)", 4)
    bands = lambda src, idc, fpc: "\n  UNION ALL\n".join(  # noqa: E731
        f"  SELECT {idc}, {fpc}, {i} AS ck,"
        f" (({fpc} // {1 << off}) % {1 << w}) AS cv FROM {src}"
        for i, (off, w) in enumerate(_hamming_chunks(16, 2))
    )
    return f"""
WITH corpus AS (
  SELECT doc_id AS cid, {fp} AS cfp FROM documents
), ev AS (
  SELECT cid AS eid,
         xor(cfp, CASE cid % 4 WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END) AS efp
  FROM corpus WHERE cid % 11 = 0
), cb AS (
{bands("corpus", "cid", "cfp")}
), eb AS (
{bands("ev", "eid", "efp")}
), matched AS (
  SELECT DISTINCT cid, eid,
         CAST(bit_count(xor(cfp, efp)) AS INT) AS ham
  FROM cb JOIN eb USING (ck, cv)
  WHERE bit_count(xor(cfp, efp)) <= 2
), ranked AS (
  SELECT cid, eid, ham,
         row_number() OVER (PARTITION BY cid ORDER BY eid) AS rn
  FROM matched
)
SELECT cid AS doc_id, count(*) AS n_eval_matches,
       CAST(min(ham) AS INT) AS min_hamming,
       array_to_string(list_sort(list(eid::VARCHAR) FILTER (rn <= 10)), ',')
         AS sample_eval_ids_csv
FROM ranked GROUP BY 1
"""


SQL_PHASH_CONTAMINATION = _phash_contamination_sql()


def q_hot_grams_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-corpus hot n-grams (operators/decontam.hot_grams): the
    Lee-et-al.-2022 duplicated-text signal — grams shared by ≥5
    distinct docs, capped to the 100 hottest (deterministic
    n_docs-desc/gram-asc tie-break, so the top-k cap itself is
    oracle-checkable). n=3 matches the contamination query's synthetic
    scale (production default 8–13)."""
    from bigdime_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    return decontam.hot_grams(d, n=3, min_docs=5, max_hot=100)


SQL_HOT_GRAMS = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents
), gr AS (
  SELECT doc_id,
         list_filter(list_distinct([array_to_string(t[i:i+2], ' ')
             FOR i IN generate_series(1, greatest(len(t) - 2, 1))]),
             g -> g <> '') AS gs
  FROM toks
), per AS (
  SELECT unnest(gs) AS gram FROM gr
)
SELECT gram, count(*) AS n_docs
FROM per GROUP BY 1 HAVING count(*) >= 5
ORDER BY n_docs DESC, gram ASC LIMIT 100
"""


def q_dup_gram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-gram load (operators/decontam.
    duplicated_gram_scan): which docs are built from corpus-repeated
    3-grams and how much of each doc is repeated (hot_fraction → 1.0
    = boilerplate). The hot set (min_docs=5, cap 1000 — non-binding
    here, the binding path is q_hot_grams_documents) broadcasts into
    the probe, so the corpus side never shuffles."""
    from bigdime_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    return decontam.duplicated_gram_scan(d, n=3, min_docs=5, max_hot=1000)


SQL_DUP_GRAMS = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents
), gr AS (
  SELECT doc_id,
         list_filter(list_distinct([array_to_string(t[i:i+2], ' ')
             FOR i IN generate_series(1, greatest(len(t) - 2, 1))]),
             g -> g <> '') AS gs
  FROM toks
), per AS (
  SELECT doc_id, len(gs) AS n_grams, unnest(gs) AS gram FROM gr
), hot AS (
  SELECT gram FROM (
    SELECT gram, count(*) AS n_docs
    FROM per GROUP BY 1 HAVING count(*) >= 5
    ORDER BY n_docs DESC, gram ASC LIMIT 1000
  )
), hits AS (
  SELECT doc_id, n_grams, count(*) AS n_hot,
         array_to_string(list_sort(list(gram))[1:10], ',') AS sample_grams_csv
  FROM per JOIN hot USING (gram)
  GROUP BY 1, 2
)
SELECT doc_id, n_grams, n_hot,
       round(n_hot::DOUBLE / n_grams, 6) AS hot_fraction,
       sample_grams_csv
FROM hits WHERE n_hot >= 1
"""


def q_repeated_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-doc repeated spans (operators/decontam.
    repeated_spans): the removal step of exact-substring dedup (Lee
    et al. 2022) — WHERE the corpus-duplicated text sits in each doc,
    as 1-based token ranges after gaps-and-islands merging of flagged
    gram positions. String-keyed mode here so the shuffle key is
    replayable in ANSI SQL; production flips hash_grams=True."""
    from bigdime_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    return decontam.repeated_spans(d, n=3, min_docs=5)


_SPAN_POS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\s+') END AS t
  FROM documents
), pos AS (
  SELECT doc_id, u.i AS p, array_to_string(t[u.i:u.i+2], ' ') AS gram
  FROM toks,
       unnest(generate_series(1, greatest(len(t) - 2, 0))) AS u(i)
), rep AS (
  SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 5
), flagged AS (
  SELECT doc_id, p FROM pos JOIN rep USING (gram)
), isl AS (
  SELECT doc_id, p,
         CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) <= 3
              THEN 0 ELSE 1 END AS brk
  FROM flagged
), grp AS (
  SELECT doc_id, p,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl_id
  FROM isl
), spans AS (
  SELECT doc_id,
         CAST(min(p) AS BIGINT) AS span_start,
         CAST(max(p) + 2 AS BIGINT) AS span_end,
         CAST(max(p) + 3 - min(p) AS BIGINT) AS span_words,
         count(*) AS n_grams
  FROM grp GROUP BY doc_id, isl_id
)
"""

SQL_REPEATED_SPANS = (
    _SPAN_POS_SQL
    + "SELECT doc_id, span_start, span_end, span_words, n_grams FROM spans"
)


def q_span_coverage_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repeated-span coverage (operators/decontam.
    span_coverage): the drop/keep curation signal of substring dedup —
    one row per doc (clean docs carry zeros), dup_fraction the share
    of tokens inside cross-corpus repeated spans."""
    from bigdime_spark.operators import decontam

    d = _t(spark, sf_dir, "documents")
    return decontam.span_coverage(d, n=3, min_docs=5)


SQL_SPAN_COVERAGE = (
    _SPAN_POS_SQL
    + r"""
, per AS (
  SELECT doc_id, count(*) AS n_spans, sum(span_words) AS dup_words
  FROM spans GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN trim(d.text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END
            AS BIGINT) AS n_words,
       CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(per.dup_words, 0) AS BIGINT) AS dup_words,
       CASE WHEN (CASE WHEN trim(d.text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END) > 0
            THEN coalesce(per.dup_words, 0)::DOUBLE /
                 (CASE WHEN trim(d.text) = '' THEN 0
                       ELSE len(regexp_split_to_array(trim(d.text), '\s+')) END)
            ELSE 0.0 END AS dup_fraction
FROM documents d LEFT JOIN per USING (doc_id)
"""
)


def q_kmv_overlap_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-overlap sketch comparison (operators/kmv): the
    set-INTERSECTION estimate HLL cannot give — full orders key set vs
    its F-status slice (the raw-vs-curated cross-snapshot question at
    kilobyte cost). Every number is a deterministic function of two
    bottom-256 md5-hash arrays, so sketching AND estimation replay
    value-exactly in DuckDB."""
    from bigdime_spark.operators import kmv

    o = _t(spark, sf_dir, "orders")
    return kmv.kmv_overlap(
        o, "o_orderkey", o.filter(F.col("o_orderstatus") == "F"), "o_orderkey",
        k=256,
    )


_KMV_DIGITS = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (11 - i)}::BIGINT"
    for i in range(12)
)
_KMV_SPACE = 16 ** 12

SQL_KMV_OVERLAP = f"""
WITH ha AS (
  SELECT ({_KMV_DIGITS}) AS hv FROM (
    SELECT DISTINCT md5(o_orderkey::VARCHAR || ':kmv') AS h FROM orders
  ) ORDER BY 1 LIMIT 256
),
hb AS (
  SELECT ({_KMV_DIGITS}) AS hv FROM (
    SELECT DISTINCT md5(o_orderkey::VARCHAR || ':kmv') AS h
    FROM orders WHERE o_orderstatus = 'F'
  ) ORDER BY 1 LIMIT 256
),
sa AS (SELECT count(*) AS na, list(hv ORDER BY hv) AS la FROM ha),
sb AS (SELECT count(*) AS nb, list(hv ORDER BY hv) AS lb FROM hb),
m AS (
  SELECT na, nb, la, lb,
         CASE WHEN na < 256 THEN {_KMV_SPACE} ELSE la[256] END AS ta,
         CASE WHEN nb < 256 THEN {_KMV_SPACE} ELSE lb[256] END AS tb
  FROM sa, sb
),
u AS (
  SELECT na, nb, la, lb,
         CASE WHEN len(cov) > 256 THEN cov[1:256] ELSE cov END AS ul
  FROM (
    SELECT na, nb, la, lb,
           list_filter(list_sort(list_distinct(la || lb)),
                       x -> x <= least(ta, tb)) AS cov
    FROM m
  )
),
est AS (
  SELECT
    CASE WHEN na < 256 THEN na::DOUBLE
         ELSE 255.0 * {_KMV_SPACE} / la[256] END AS n_a_est,
    CASE WHEN nb < 256 THEN nb::DOUBLE
         ELSE 255.0 * {_KMV_SPACE} / lb[256] END AS n_b_est,
    CASE WHEN len(ul) < 256 THEN len(ul)::DOUBLE
         ELSE 255.0 * {_KMV_SPACE} / ul[len(ul)] END AS union_est,
    CASE WHEN len(ul) > 0
         THEN len(list_filter(ul, x -> list_contains(la, x)
                                   AND list_contains(lb, x)))::DOUBLE / len(ul)
         ELSE 0.0 END AS rho
  FROM u
)
SELECT CAST(256 AS BIGINT) AS k,
       round(n_a_est, 4) AS n_a_est,
       round(n_b_est, 4) AS n_b_est,
       round(union_est, 4) AS union_est,
       round(rho, 6) AS jaccard_est,
       round(rho * union_est, 4) AS intersect_est
FROM est
"""


def q_kmv_churn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part cross-run key churn from KMV sketches (operators/kmv.
    kmv_part_sketches + kmv_churn): full orders keys vs a
    deterministic 75% slice, per o_orderpriority — the run-over-run
    "how many keys appeared/vanished per partition" question at
    sketch cost. The oracle replays per-part bottom-64 selection and
    every estimator (theta truncation, union, rho, new/lost clamps)
    in DuckDB."""
    from bigdime_spark.operators import kmv

    o = _t(spark, sf_dir, "orders")
    prev = kmv.kmv_part_sketches(o, "o_orderpriority", "o_orderkey", k=64)
    cur = kmv.kmv_part_sketches(
        o.filter(F.col("o_orderkey") % 4 != 0), "o_orderpriority", "o_orderkey",
        k=64,
    )
    return kmv.kmv_churn(prev, cur)


SQL_KMV_CHURN = f"""
WITH pa AS (
  SELECT part, ({_KMV_DIGITS}) AS hv FROM (
    SELECT DISTINCT o_orderpriority AS part,
           md5(o_orderkey::VARCHAR || ':kmv') AS h
    FROM orders)
),
pb AS (
  SELECT part, ({_KMV_DIGITS}) AS hv FROM (
    SELECT DISTINCT o_orderpriority AS part,
           md5(o_orderkey::VARCHAR || ':kmv') AS h
    FROM orders WHERE o_orderkey % 4 <> 0)
),
ka AS (
  SELECT part, count(*) AS na, list(hv ORDER BY hv) AS la FROM (
    SELECT part, hv,
           row_number() OVER (PARTITION BY part ORDER BY hv) AS rn
    FROM pa
  ) WHERE rn <= 64 GROUP BY part
),
kb AS (
  SELECT part, count(*) AS nb, list(hv ORDER BY hv) AS lb FROM (
    SELECT part, hv,
           row_number() OVER (PARTITION BY part ORDER BY hv) AS rn
    FROM pb
  ) WHERE rn <= 64 GROUP BY part
),
m AS (
  SELECT coalesce(a.part, b.part) AS part,
         coalesce(a.na, 0) AS na, coalesce(a.la, []::BIGINT[]) AS la,
         coalesce(b.nb, 0) AS nb, coalesce(b.lb, []::BIGINT[]) AS lb
  FROM ka a FULL JOIN kb b ON a.part = b.part
),
u AS (
  SELECT part, na, la, nb, lb,
         CASE WHEN len(cov) > 64 THEN cov[1:64] ELSE cov END AS ul
  FROM (
    SELECT part, na, la, nb, lb,
           list_filter(list_sort(list_distinct(la || lb)),
                       x -> x <= least(
                         CASE WHEN na < 64 THEN {_KMV_SPACE} ELSE la[64] END,
                         CASE WHEN nb < 64 THEN {_KMV_SPACE} ELSE lb[64] END)) AS cov
    FROM m
  )
),
est AS (
  SELECT part,
    CASE WHEN na < 64 THEN na::DOUBLE
         ELSE 63.0 * {_KMV_SPACE} / la[64] END AS n_a_est,
    CASE WHEN nb < 64 THEN nb::DOUBLE
         ELSE 63.0 * {_KMV_SPACE} / lb[64] END AS n_b_est,
    CASE WHEN len(ul) < 64 THEN len(ul)::DOUBLE
         ELSE 63.0 * {_KMV_SPACE} / ul[len(ul)] END AS union_est,
    CASE WHEN len(ul) > 0
         THEN len(list_filter(ul, x -> list_contains(la, x)
                                   AND list_contains(lb, x)))::DOUBLE / len(ul)
         ELSE 0.0 END AS rho
  FROM u
)
SELECT part, CAST(64 AS BIGINT) AS k,
       round(n_a_est, 4) AS n_prev_est,
       round(n_b_est, 4) AS n_cur_est,
       round(union_est, 4) AS union_est,
       round(rho, 6) AS jaccard_est,
       round(rho * union_est, 4) AS intersect_est,
       round(greatest(0.0, round(n_b_est, 4) - round(rho * union_est, 4)), 4)
         AS new_est,
       round(greatest(0.0, round(n_a_est, 4) - round(rho * union_est, 4)), 4)
         AS lost_est
FROM est
"""


# =====================================================================
# Similarity search (embeddings table)
# =====================================================================

_COS_SQL = (
    "round(list_dot_product(q.v, c.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)"
)


def q_embedding_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table pre-flight (operators/similarity.
    embedding_integrity): the invariants every ANN/dedup path assumes
    — uniform dims, no NULL/NaN/Inf/zero vectors, sane norms — as ONE
    fused single-scan aggregate."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.embedding_integrity(e, "vec_id", "embedding")


SQL_EMBEDDING_INTEGRITY = """
WITH per AS (
  SELECT embedding AS v,
         embedding IS NULL AS is_null,
         CASE WHEN embedding IS NOT NULL THEN
           len(list_filter(embedding,
               x -> isnan(x::DOUBLE) OR isinf(x::DOUBLE))) > 0
         END AS nonfinite,
         CASE WHEN embedding IS NOT NULL THEN
           list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))
         END AS sumsq
  FROM embeddings
)
SELECT count(*) AS n_rows,
       count(*) FILTER (is_null) AS n_null_vec,
       count(DISTINCT CASE WHEN NOT is_null THEN len(v) END) AS n_dims,
       count(*) FILTER (coalesce(nonfinite, false)) AS n_nonfinite,
       count(*) FILTER (NOT is_null AND NOT nonfinite AND sumsq = 0.0) AS n_zero,
       round(min(CASE WHEN NOT is_null AND NOT nonfinite THEN sqrt(sumsq) END), 6)
         AS min_norm,
       round(max(CASE WHEN NOT is_null AND NOT nonfinite THEN sqrt(sumsq) END), 6)
         AS max_norm,
       round(avg(CASE WHEN NOT is_null AND NOT nonfinite THEN sqrt(sumsq) END), 6)
         AS avg_norm
FROM per
"""


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.brute_force_topk(e, queries, "vec_id", "embedding", k=5)


SQL_ANN_TOPK = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 5
"""


def q_ann_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C63 SQ8 scalar-quantized ANN (operators/similarity.sq_topk):
    per-dimension min/max bounds trained on the table, int8 codes
    (4× smaller than float32 through the corpus scan — the memory/IO
    lever at 10¹² vectors), asymmetric bucket-midpoint decode for the
    approximate stage, exact re-rank of the k·refine candidates. The
    oracle replays training, the clamp/floor encode, the midpoint
    decode, BOTH rankings and the round-6 tie conventions in DuckDB —
    quantization error under oracle test end to end."""
    e = _t(spark, sf_dir, "embeddings")
    bounds = similarity.sq_bounds(e)
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.sq_topk(
        e, queries, bounds, "vec_id", "embedding", k=5, refine=4
    )


SQL_ANN_SQ = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (
  SELECT pos, min(x) AS lo, max(x) AS hi
  FROM (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS pos FROM e)
  GROUP BY 1
),
cb AS (
  SELECT list(lo ORDER BY pos) AS l,
         list((hi - lo) / 256.0 ORDER BY pos) AS sc
  FROM dims
),
dec AS (
  SELECT c.vec_id AS neighbor_id,
         [cb.l[i] + (least(255, greatest(0,
             CASE WHEN cb.sc[i] > 0
                  THEN floor((c.v[i] - cb.l[i]) / cb.sc[i])
                  ELSE 0 END)) + 128.5 - 128.0) * cb.sc[i]
          FOR i IN generate_series(1, len(c.v))]::DOUBLE[] AS dv
  FROM e c CROSS JOIN cb
),
approx AS (
  SELECT q.vec_id AS query_id, d.neighbor_id,
         round(list_dot_product(q.v, d.dv) /
           (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(d.dv, d.dv))), 6)
           AS acos
  FROM e q JOIN dec d ON q.vec_id < 8 AND d.neighbor_id <> q.vec_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY acos DESC, neighbor_id ASC) AS rk
    FROM approx
  ) WHERE rk <= 20
),
exact AS (
  SELECT k.query_id, k.neighbor_id,
         round(list_dot_product(q.v, c.v) /
           (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))), 6)
           AS cosine
  FROM cand k
  JOIN e c ON c.vec_id = k.neighbor_id
  JOIN e q ON q.vec_id = k.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM exact
) WHERE rank <= 5
"""


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C65 product-quantized ANN (operators/similarity.pq_topk): 8
    subspaces × 16 seed codewords (the 16 smallest-id vectors'
    sub-vectors — deterministic, no k-means to replay cross-engine;
    pq_refine is the trainable path under pytest), per-subspace
    argmin-L2 encode to 8 codes (first-min tie → smallest code),
    ADC scoring via per-query dot LUTs + literal codeword self-norms
    summed in subspace order, exact re-rank of k·refine candidates.
    The oracle replays seeding, the argmin encode, the grouped
    per-subspace sums, and BOTH rankings in DuckDB — the quantization
    arithmetic end to end."""
    e = _t(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebooks(e, m=8, ncodes=16)
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.pq_topk(
        e, queries, cb, "vec_id", "embedding", k=5, refine=4
    )


SQL_ANN_PQ = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE embedding IS NOT NULL),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
cw AS (
  SELECT s.sub, seeds.code, seeds.v[s.sub*8+1 : s.sub*8+8] AS cvec
  FROM seeds CROSS JOIN subs s
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
           row_number() OVER (PARTITION BY e.vec_id, c.sub
             ORDER BY list_sum([(e.v[c.sub*8+i] - c.cvec[i])
                                * (e.v[c.sub*8+i] - c.cvec[i])
                                FOR i IN generate_series(1, 8)]),
                      c.code) AS rn
    FROM e CROSS JOIN cw c
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.sub, c.code,
         list_dot_product(q.v[c.sub*8+1 : c.sub*8+8], c.cvec) AS dp,
         list_dot_product(c.cvec, c.cvec) AS n2
  FROM (SELECT * FROM e WHERE vec_id < 8) q CROSS JOIN cw c
),
approx AS (
  SELECT l.query_id, n.vec_id AS neighbor_id,
         round(list_sum(list(l.dp ORDER BY l.sub)) /
               (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_sum(list(l.n2 ORDER BY l.sub)))), 6) AS acos
  FROM enc n
  JOIN lut l ON l.sub = n.sub AND l.code = n.code
  JOIN e q ON q.vec_id = l.query_id
  WHERE n.vec_id <> l.query_id
  GROUP BY l.query_id, n.vec_id, q.v
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY acos DESC, neighbor_id ASC) AS rk
    FROM approx
  ) WHERE rk <= 20
),
exact AS (
  SELECT k.query_id, k.neighbor_id,
         round(list_dot_product(q.v, c.v) /
           (sqrt(list_dot_product(q.v, q.v))
            * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM cand k
  JOIN e c ON c.vec_id = k.neighbor_id
  JOIN e q ON q.vec_id = k.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM exact
) WHERE rank <= 5
"""


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C66 IVF-PQ (operators/similarity.ivfpq_topk): the composed
    production index — IVF prunes WHICH cells are scanned (same 17
    deterministic data-point centroids as ann_ivf_topk, nprobe=2), PQ
    shrinks WHAT is scanned inside them (same 8×16 seed codebooks as
    ann_pq_topk), exact re-rank of k·refine. The oracle composes both
    signal oracles' replay: coarse assignment (cos rounded 9, ties →
    min cid), probing, argmin encode, grouped LUT sums, both
    rankings."""
    e = _t(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebooks(e, m=8, ncodes=16)
    centroids = e.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.ivfpq_topk(
        e, queries, centroids, cb, "vec_id", "embedding",
        k=5, nprobe=2, refine=4,
    )


SQL_ANN_IVFPQ = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
ascore AS (
  SELECT a.vec_id AS id, c.cid AS cid,
         round(list_dot_product(a.v, c.cv) /
           (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos
  FROM e a, cent c
),
cells AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore
  ) WHERE rn = 1
),
qcells AS (
  SELECT id AS query_id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore WHERE id < 8
  ) WHERE rn <= 2
),
seeds AS (
  SELECT v, row_number() OVER (ORDER BY vec_id) - 1 AS code
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
subs AS (SELECT unnest(generate_series(0, 7)) AS sub),
cw AS (
  SELECT s.sub, seeds.code, seeds.v[s.sub*8+1 : s.sub*8+8] AS cvec
  FROM seeds CROSS JOIN subs s
),
enc AS (
  SELECT vec_id, sub, code FROM (
    SELECT e.vec_id, c.sub, c.code,
           row_number() OVER (PARTITION BY e.vec_id, c.sub
             ORDER BY list_sum([(e.v[c.sub*8+i] - c.cvec[i])
                                * (e.v[c.sub*8+i] - c.cvec[i])
                                FOR i IN generate_series(1, 8)]),
                      c.code) AS rn
    FROM e CROSS JOIN cw c
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, c.sub, c.code,
         list_dot_product(q.v[c.sub*8+1 : c.sub*8+8], c.cvec) AS dp,
         list_dot_product(c.cvec, c.cvec) AS n2
  FROM (SELECT * FROM e WHERE vec_id < 8) q CROSS JOIN cw c
),
approx AS (
  SELECT qc.query_id, n.vec_id AS neighbor_id,
         round(list_sum(list(l.dp ORDER BY l.sub)) /
               (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_sum(list(l.n2 ORDER BY l.sub)))), 6) AS acos
  FROM qcells qc
  JOIN cells cl ON cl.cid = qc.cid AND cl.id <> qc.query_id
  JOIN enc n ON n.vec_id = cl.id
  JOIN lut l ON l.query_id = qc.query_id AND l.sub = n.sub AND l.code = n.code
  JOIN e q ON q.vec_id = qc.query_id
  GROUP BY qc.query_id, n.vec_id, q.v
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY acos DESC, neighbor_id ASC) AS rk
    FROM approx
  ) WHERE rk <= 20
),
exact AS (
  SELECT k.query_id, k.neighbor_id,
         round(list_dot_product(q.v, c.v) /
           (sqrt(list_dot_product(q.v, q.v))
            * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
  FROM cand k
  JOIN e c ON c.vec_id = k.neighbor_id
  JOIN e q ON q.vec_id = k.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM exact
) WHERE rank <= 5
"""


def q_ivf_cell_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C66b index-quality profile (operators/similarity.
    ivf_cell_profile): cell-size distribution of the IVF-PQ index —
    the skew lens applied to the index itself (a hot cell IS the
    probe-time tail latency). Same deterministic centroids as the
    ann_ivf* queries; the oracle replays assignment and the share
    arithmetic."""
    e = _t(spark, sf_dir, "embeddings")
    cb = similarity.pq_codebooks(e, m=8, ncodes=16)
    centroids = e.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    idx = similarity.ivfpq_index(e, centroids, cb)
    return similarity.ivf_cell_profile(idx)


SQL_IVF_CELL_PROFILE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
           FROM embeddings WHERE embedding IS NOT NULL),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
ascore AS (
  SELECT a.vec_id AS id, c.cid AS cid,
         round(list_dot_product(a.v, c.cv) /
           (sqrt(list_dot_product(a.v, a.v))
            * sqrt(list_dot_product(c.cv, c.cv))), 9) AS cos
  FROM e a, cent c
),
cells AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore
  ) WHERE rn = 1
),
agg AS (SELECT cid, count(*) AS n FROM cells GROUP BY 1)
SELECT cid, n,
       round(n / sum(n) OVER (), 6) AS frac,
       round((n / sum(n) OVER ()) * (n / sum(n) OVER ()), 6)
         AS expected_scan_frac
FROM agg
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/C8's inverted-file sibling: IVF-flat top-5 with 17 data-point
    centroids (vec_id % 31 == 0, deterministic — no k-means iterations
    to replay cross-engine) and nprobe=2. The oracle replays cell
    assignment (argmax rounded cosine, ties → min cid), query probing,
    and the within-cell ranking exactly."""
    e = _t(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.ivf_topk(
        e, queries, centroids, "vec_id", "embedding", k=5, nprobe=2
    )


_COS9_SQL = (
    "round(list_dot_product(a.v, c.cv) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9)"
)
SQL_ANN_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
ascore AS (
  SELECT a.vec_id AS id, c.cid AS cid, {_COS9_SQL} AS cos
  FROM e a, cent c
),
cells AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore
  ) WHERE rn = 1
),
qcells AS (
  SELECT id AS query_id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore WHERE id < 8
  ) WHERE rn <= 2
),
scored AS (
  SELECT q.query_id, cl.id AS neighbor_id,
         round(list_dot_product(qe.v, n.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
  FROM qcells q
  JOIN cells cl ON cl.cid = q.cid AND cl.id <> q.query_id
  JOIN e n ON n.vec_id = cl.id
  JOIN e qe ON qe.vec_id = q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 5
"""


def q_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@5 vs nprobe sweep (operators/similarity.
    ivf_recall_curve): the latency/recall tuning curve, computed from
    ONE corpus assignment shared across the swept nprobe values (each
    scored candidate explodes into the nprobe values ≥ its cell rank).
    Same deterministic data-point centroids and query set as
    ann_ivf_topk; the oracle replays assignment, cell ranking, the
    per-(query, nprobe) top-5, the brute-force exact top-5 and the
    hit counting in SQL — recall must be monotone in nprobe by
    construction, and the driver hash checks the exact values."""
    e = _t(spark, sf_dir, "embeddings")
    cents = (
        e.filter(F.col("vec_id") % 31 == 0)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec"))
    )
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.ivf_recall_curve(
        e, queries, cents, "vec_id", "embedding", k=5, nprobes=(1, 2, 4)
    )


SQL_IVF_RECALL_CURVE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
ascore AS (
  SELECT a.vec_id AS id, c.cid AS cid, {_COS9_SQL} AS cos
  FROM e a, cent c
),
cells AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore
  ) WHERE rn = 1
),
qcr AS (
  SELECT id AS query_id, cid, rn AS cr FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore WHERE id < 8
  ) WHERE rn <= 4
),
nps AS (SELECT * FROM (VALUES (1), (2), (4)) t(np)),
scored AS (
  SELECT n.np, q.query_id, cl.id AS neighbor_id,
         round(list_dot_product(qe.v, nn.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(nn.v, nn.v))), 6) AS cosine
  FROM qcr q
  JOIN cells cl ON cl.cid = q.cid AND cl.id <> q.query_id
  JOIN e nn ON nn.vec_id = cl.id
  JOIN e qe ON qe.vec_id = q.query_id
  JOIN nps n ON n.np >= q.cr
),
retr AS (
  SELECT np, query_id, neighbor_id FROM (
    SELECT np, query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id, np
                              ORDER BY cosine DESC, neighbor_id ASC) AS rk
    FROM scored
  ) WHERE rk <= 5
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT qe.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY qe.vec_id ORDER BY
             round(list_dot_product(qe.v, c.v) /
                   (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(c.v, c.v))), 6) DESC,
             c.vec_id ASC) AS rk
    FROM e qe JOIN e c ON c.vec_id <> qe.vec_id
    WHERE qe.vec_id < 8
  ) WHERE rk <= 5
),
hits AS (
  SELECT np, count(*) AS n_hits
  FROM retr JOIN exact USING (query_id, neighbor_id) GROUP BY 1
),
nq AS (SELECT count(*) AS n_queries FROM e WHERE vec_id < 8)
SELECT CAST(n.np AS BIGINT) AS nprobe,
       CAST(nq.n_queries AS BIGINT) AS n_queries,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0)::DOUBLE / (5 * nq.n_queries), 6) AS recall_at_k
FROM nps n CROSS JOIN nq LEFT JOIN hits h ON h.np = n.np
"""


def q_ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat top-5 with TRAINED centroids (round-5): one
    deterministic spherical-k-means iteration from 12 md5-seeded
    data-point inits, then nprobe=2 search. The oracle replays the
    ENTIRE pipeline in SQL — init ordering (md5('42|'||vec_id)),
    argmax assignment (cos rounded to 9, ties → min cid), per-cell
    element-wise means (rounded to 9, empty cells keep their init),
    probing and ranking — proving the training step itself is
    engine-portable, not just the search."""
    e = _t(spark, sf_dir, "embeddings")
    trained = similarity.ivf_train_centroids(
        e, k=12, iters=1, id_col="vec_id", vec_col="embedding", seed=42
    )
    queries = e.filter(F.col("vec_id") < 8)
    return similarity.ivf_topk(
        e, queries, trained, "vec_id", "embedding", k=5, nprobe=2
    )


_COS9_CV_SQL = (
    "round(list_dot_product(a.v, c.cv) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.cv, c.cv))), 9)"
)
SQL_ANN_IVF_TRAINED = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
init AS (
  SELECT row_number() OVER (ORDER BY md5('42|' || vec_id)) - 1 AS cid, v AS cv
  FROM e ORDER BY md5('42|' || vec_id) LIMIT 12
),
a0 AS (
  SELECT a.vec_id AS id, c.cid, {_COS9_CV_SQL} AS cos
  FROM e a, init c
),
cells0 AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM a0
  ) WHERE rn = 1
),
means AS (
  SELECT c0.cid, r.i AS ord, round(avg(e2.v[r.i]), 9)::DOUBLE AS m
  FROM cells0 c0 JOIN e e2 ON e2.vec_id = c0.id CROSS JOIN range(1, 65) r(i)
  GROUP BY c0.cid, r.i
),
newc AS (SELECT cid, list(m ORDER BY ord) AS cv FROM means GROUP BY cid),
cent AS (
  SELECT i.cid, coalesce(n.cv, i.cv) AS cv FROM init i LEFT JOIN newc n USING (cid)
),
ascore AS (
  SELECT a.vec_id AS id, c.cid, {_COS9_CV_SQL} AS cos FROM e a, cent c
),
cells AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore
  ) WHERE rn = 1
),
qcells AS (
  SELECT id AS query_id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore WHERE id < 8
  ) WHERE rn <= 2
),
scored AS (
  SELECT q.query_id, cl.id AS neighbor_id,
         round(list_dot_product(qe.v, n.v) /
               (sqrt(list_dot_product(qe.v, qe.v)) * sqrt(list_dot_product(n.v, n.v))), 6) AS cosine
  FROM qcells q
  JOIN cells cl ON cl.cid = q.cid AND cl.id <> q.query_id
  JOIN e n ON n.vec_id = cl.id
  JOIN e qe ON qe.vec_id = q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 5
"""


def q_ann_lsh_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_nearest_in_bucket(e, "vec_id", "embedding", nbits=4)


_BUCKET_SQL = " + ".join(
    f"CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END" for i in range(4)
)
SQL_ANN_LSH = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ({_BUCKET_SQL}) AS bucket
  FROM embeddings
), scored AS (
  SELECT q.vec_id AS vec_id, q.bucket AS bucket, c.vec_id AS neighbor_id, {_COS_SQL} AS cosine
  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
), ranked AS (
  SELECT vec_id, bucket, neighbor_id, cosine,
         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rn
  FROM scored
)
SELECT vec_id, bucket, neighbor_id, cosine FROM ranked WHERE rn = 1
"""


def q_ann_hyperplane_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe ANN: seeded random-hyperplane LSH (16 bits = 4 tables
    × 4-bit bands, radius-1 multi-probe on the query side) measured as
    recall@5 against the exact brute-force top-5. The plane matrix is
    deterministic (md5 Box–Muller) and embedded as double literals in
    BOTH engines, so the oracle replays the identical algorithm."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 8)
    approx = similarity.hyperplane_topk(
        e, queries, "vec_id", "embedding",
        nbits=16, bands=4, k=5, seed=42, multiprobe=1, dim=64,
    )
    exact = similarity.brute_force_topk(e, queries, "vec_id", "embedding", k=5)
    return similarity.ann_recall(approx, exact, k=5)


def _hyperplane_recall_sql(nbits: int = 16, bands: int = 4, seed: int = 42, dim: int = 64) -> str:
    planes = similarity.hyperplane_planes(dim, nbits, seed)
    w = nbits // bands
    sig_terms = "\n       + ".join(
        "CASE WHEN round(list_dot_product(v, [{lits}]), 9) >= 0 THEN {bit} ELSE 0 END".format(
            lits=", ".join(repr(x) for x in plane), bit=1 << b
        )
        for b, plane in enumerate(planes)
    )
    band_cols = ", ".join(
        f"((s // {1 << (i * w)}) % {1 << w}) AS b{i}" for i in range(bands)
    )
    tb_vals = ", ".join(f"({i})" for i in range(bands))
    band_case = "CASE t.tb " + " ".join(
        f"WHEN {i} THEN b{i}" for i in range(bands - 1)
    ) + f" ELSE b{bands - 1} END"
    masks = ", ".join(["(0)"] + [f"({1 << j})" for j in range(w)])
    cos = (
        "round(list_dot_product(p.qv, c.v) / "
        "(sqrt(list_dot_product(p.qv, p.qv)) * sqrt(list_dot_product(c.v, c.v))), 6)"
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (
  SELECT vec_id, v,
       ({sig_terms}) AS s
  FROM e
), bands AS (
  SELECT vec_id, v, {band_cols} FROM sig
), cband AS (
  SELECT vec_id, v, t.tb, ({band_case})::BIGINT AS bv
  FROM bands, (VALUES {tb_vals}) t(tb)
), qprobe AS (
  SELECT vec_id AS query_id, v AS qv, tb, xor(bv, m.mask::BIGINT) AS bv
  FROM cband, (VALUES {masks}) m(mask)
  WHERE vec_id < 8
), cand AS (
  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM qprobe p JOIN cband c ON p.tb = c.tb AND p.bv = c.bv AND c.vec_id <> p.query_id
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
    FROM cand
  ) WHERE rk <= 5
), brute AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {_COS_SQL} DESC, c.vec_id ASC) AS rk
    FROM e q JOIN e c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
  ) WHERE rk <= 5
)
SELECT b.query_id, round(count(a.neighbor_id) / 5.0, 6) AS recall
FROM brute b LEFT JOIN approx a
  ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
GROUP BY 1
"""


SQL_ANN_HYPERPLANE_RECALL = _hyperplane_recall_sql()


def q_embedding_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return similarity.similarity_histogram(e, "vec_id", "embedding", block_col="label", nbins=20)


SQL_SIM_HISTOGRAM = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT {_COS_SQL} AS cosine
  FROM e q JOIN e c ON q.label = c.label AND q.vec_id < c.vec_id
)
SELECT least(19, greatest(0, CAST(floor((cosine + 1.0) / 2.0 * 20) AS INT))) AS bucket,
       count(*) AS cnt
FROM pairs GROUP BY 1
"""


def q_embedding_sim_histogram_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100-TB form of the pairwise-cosine histogram: deterministic
    1/5 pair sampling (md5 of the id pair) BEFORE the cosine fold."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.similarity_histogram(
        e, "vec_id", "embedding", block_col="label", nbins=20, sample_mod=5
    )


_PAIR_H4 = _hex_to_int_sql(
    "md5(concat_ws('|', q.vec_id::VARCHAR, c.vec_id::VARCHAR))", 4
)
SQL_SIM_HISTOGRAM_SAMPLED = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
sampled AS (
  SELECT q.v AS qv, c.v AS cv
  FROM e q JOIN e c ON q.label = c.label AND q.vec_id < c.vec_id
       AND {_PAIR_H4} % 5 = 0
), pairs AS (
  SELECT round(list_dot_product(qv, cv) /
         (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 6) AS cosine
  FROM sampled
)
SELECT least(19, greatest(0, CAST(floor((cosine + 1.0) / 2.0 * 20) AS INT))) AS bucket,
       count(*) AS cnt
FROM pairs GROUP BY 1
"""


def q_salted_groupby_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27 — deterministic two-level salted aggregation; value-equal to
    a plain GROUP BY (the oracle), physically skew-proof."""
    from bigdime_spark.functions.skew import salted_count

    ev = _t(spark, sf_dir, "events")
    return salted_count(ev, "user_id", ("event_id",), buckets=16)


SQL_SALTED_GROUPBY = """
SELECT user_id, count(*) AS n FROM events GROUP BY 1
"""


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by label."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_dup_pairs(
        e, "vec_id", "embedding", block_col="label", threshold=0.4
    )


SQL_DEDUP_EMBEDDING = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT q.vec_id AS id1, c.vec_id AS id2, {_COS_SQL} AS cosine
  FROM e q JOIN e c ON q.label = c.label AND q.vec_id < c.vec_id
)
SELECT id1, id2, cosine FROM scored WHERE cosine >= 0.4
"""


def q_dedup_embedding_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup with IVF cells as the DATA-DRIVEN
    blocking key (round-5; the scale path when no domain block column
    exists): same deterministic data-point centroids as ann_ivf_topk,
    pairs compared only within their argmax cell. The oracle replays
    assignment and the within-cell pair scan exactly."""
    e = _t(spark, sf_dir, "embeddings")
    centroids = e.filter(F.col("vec_id") % 31 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    return similarity.cosine_dup_pairs_ivf(
        e, centroids, "vec_id", "embedding", threshold=0.4
    )


SQL_DEDUP_EMBEDDING_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 31 = 0),
ascore AS (
  SELECT a.vec_id AS id, c.cid AS cid, {_COS9_CV_SQL} AS cos
  FROM e a, cent c
),
cells AS (
  SELECT id, cid FROM (
    SELECT id, cid,
           row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid ASC) AS rn
    FROM ascore
  ) WHERE rn = 1
),
scored AS (
  SELECT l.id AS id1, r.id AS id2,
         round(list_dot_product(e1.v, e2.v) /
               (sqrt(list_dot_product(e1.v, e1.v)) * sqrt(list_dot_product(e2.v, e2.v))), 6) AS cosine
  FROM cells l
  JOIN cells r ON l.cid = r.cid AND l.id < r.id
  JOIN e e1 ON e1.vec_id = l.id
  JOIN e e2 ON e2.vec_id = r.id
)
SELECT id1, id2, cosine FROM scored WHERE cosine >= 0.4
"""


# =====================================================================
# Sampling / curation (C23–C24): deterministic hash sampling, domain
# mix planning, token-budget shard packing (operators/sampling.py).
# The 40-bit md5 sample hash is rebuilt in DuckDB with the same
# strpos digit expansion the checksum oracle uses (_DIGITS).
# =====================================================================

_SAMPLE_SEED = "r5"
_SAMPLE_RATE = 0.25
_MIX_WEIGHTS = {"src0": 4.0, "src1": 2.0, "src2": 1.0, "src3": 1.0}
_MIX_TARGET = 60
_SHARD_BUDGET = 2000


def q_sample_uniform_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23a: deterministic uniform hash sample — keep ~25% of documents
    by md5(doc_id, seed), a pure scan-local predicate (zero shuffles;
    identical subset under any repartitioning or resume)."""
    from bigdime_spark.operators.sampling import uniform_sample

    d = _t(spark, sf_dir, "documents").select("doc_id")
    out = uniform_sample(d, "doc_id", _SAMPLE_RATE, _SAMPLE_SEED, keep_hash=True)
    return out.select("doc_id", F.col("_sample_h").alias("sample_h"))


_SAMPLE_H_SQL = (
    "SELECT doc_id, source, "
    f"substr(md5(concat_ws(':', doc_id::VARCHAR, '{_SAMPLE_SEED}')), 1, 10) AS h "
    "FROM documents"
)

SQL_SAMPLE_UNIFORM: str  # assigned below once sampling constants import


def q_mix_plan_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23b: per-domain sampling plan for a 4:2:1:1 target mixture over
    src0-3 (other domains excluded) at 60 target rows — one
    domains-sized aggregate; thresholds are exact integers."""
    from bigdime_spark.operators.sampling import mix_plan

    d = _t(spark, sf_dir, "documents")
    return mix_plan(d, "source", _MIX_WEIGHTS, _MIX_TARGET)


def q_sample_stratified_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23c: deterministic stratified sample hitting the mix plan —
    broadcast plan join + hash predicate; the corpus never shuffles."""
    from bigdime_spark.operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    out = stratified_sample(
        d, "source", "doc_id", _MIX_WEIGHTS, _MIX_TARGET, _SAMPLE_SEED, keep_hash=True
    )
    return out.select("doc_id", "source", F.col("_sample_h").alias("sample_h"))


def q_shard_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: token-budget shard packing — distributed exclusive prefix
    sum of whitespace token counts in doc_id order, shards of ~2000
    tokens. n_buckets=16 here; assignments are provably invariant to
    the bucket count (tests/test_sampling.py asserts 1 vs 16)."""
    from bigdime_spark.functions.text import ws_token_count
    from bigdime_spark.operators.sampling import shard_pack

    d = _t(spark, sf_dir, "documents")
    return shard_pack(
        d, "doc_id", ws_token_count(F.col("text")), _SHARD_BUDGET, n_buckets=16
    )


#: shared Spark/DuckDB CASE for the synthetic 4-run verdict pattern:
#: pattern index p = ((first digit of the part) - 1) * 2 + cidx, mod 6
#: — the six patterns exercise every history status exactly once per
#: (part, constraint) combo (stable_pass / stable_fail / regressed /
#: recovered / flaky / changed).
_HIST_VERDICT_CASE = """
CASE ((CAST(substr(part, 1, 1) AS INT) - 1) * 2 + cidx) % 6
  WHEN 0 THEN 'PASS'
  WHEN 1 THEN 'FAIL'
  WHEN 2 THEN CASE WHEN i <= 2 THEN 'PASS' ELSE 'FAIL' END
  WHEN 3 THEN CASE WHEN i = 1 THEN 'FAIL' ELSE 'PASS' END
  WHEN 4 THEN CASE WHEN i % 2 = 1 THEN 'PASS' ELSE 'FAIL' END
  ELSE CASE WHEN i <= 2 THEN 'NOT_READY' ELSE 'PASS' END
END
"""


def q_verdict_history_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C51: cross-run verdict history / flakiness profile
    (plans/lineage.verdict_history). Input synthesized from orders'
    five priorities × two constraints × four runs with the shared
    verdict CASE, so every status class (stable_pass/stable_fail/
    regressed/recovered/flaky/changed) is under oracle test; the
    window lag, transition count, arg-min/max first/last verdicts and
    the classification CASE are all replayed in DuckDB."""
    from bigdime_spark.plans.lineage import verdict_history

    o = _t(spark, sf_dir, "orders")
    prios = o.select(F.col("o_orderpriority").alias("part")).distinct()
    cons = spark.createDataFrame(
        [("record_count", 0), ("checksum", 1)], "constraint string, cidx int"
    )
    runs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "i int")
    hist_in = (
        prios.crossJoin(F.broadcast(cons))
        .crossJoin(F.broadcast(runs))
        .select(
            F.concat(F.lit("r"), F.col("i").cast("string")).alias("run_id"),
            "part",
            "constraint",
            F.expr(_HIST_VERDICT_CASE).alias("verdict"),
        )
    )
    return verdict_history(hist_in)


SQL_VERDICT_HISTORY = f"""
WITH prios AS (SELECT DISTINCT o_orderpriority AS part FROM orders),
cons(cons_name, cidx) AS (VALUES ('record_count', 0), ('checksum', 1)),
runs(i) AS (VALUES (1), (2), (3), (4)),
hist AS (
  SELECT 'r' || CAST(i AS VARCHAR) AS run_id, part, cons_name, {_HIST_VERDICT_CASE} AS verdict
  FROM prios, cons, runs
),
seq AS (
  SELECT *, lag(verdict) OVER (PARTITION BY part, cons_name ORDER BY run_id) AS prev
  FROM hist
),
agg AS (
  SELECT part, cons_name,
         count(*) AS n_runs,
         count(*) FILTER (WHERE verdict = 'PASS') AS n_pass,
         count(*) FILTER (WHERE verdict = 'FAIL') AS n_fail,
         count(*) FILTER (WHERE prev IS NOT NULL AND verdict <> prev) AS n_transitions,
         arg_min(verdict, run_id) AS first_verdict,
         arg_max(verdict, run_id) AS last_verdict
  FROM seq GROUP BY part, cons_name
)
SELECT part, cons_name AS "constraint", n_runs, n_pass, n_fail, n_transitions,
       first_verdict, last_verdict,
       CASE WHEN n_transitions >= 2 THEN 'flaky'
            WHEN n_transitions = 1 AND last_verdict = 'FAIL' AND n_pass > 0 THEN 'regressed'
            WHEN n_transitions = 1 AND last_verdict = 'PASS' AND n_fail > 0 THEN 'recovered'
            WHEN n_transitions = 1 THEN 'changed'
            WHEN last_verdict = 'PASS' THEN 'stable_pass'
            WHEN last_verdict = 'FAIL' THEN 'stable_fail'
            ELSE 'stable_other' END AS status
FROM agg
"""


#: shared Spark/DuckDB CASE for the synthetic 4-run metric history:
#: pattern p = ((first digit of part) - 1) * 2 + mi, mod 4 — the four
#: patterns exercise OK (small additive drift), ANOMALY (10x per run),
#: ANOMALY via zero→nonzero (infinite rate, rel NULL), and NOT_READY
#: (NULL latest value).
_TREND_VALUE_CASE = """
CASE ((CAST(substr(part, 1, 1) AS INT) - 1) * 2 + {mi}) % 4
  WHEN 0 THEN 100.0 + i
  WHEN 1 THEN power(10.0, i)
  WHEN 2 THEN CASE WHEN i < 4 THEN 0.0 ELSE 5.0 END
  ELSE CASE WHEN i = 4 THEN NULL ELSE 50.0 END
END
"""


def q_metric_trend_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C53: run-over-run metric anomaly detection
    (operators/outliers.metric_trend — deequ's RelativeRateOfChange).
    Input synthesized from orders' five priorities × four runs × two
    metric columns with the shared value CASE, so every verdict class
    (OK / rel-change ANOMALY / zero→nonzero infinite-rate ANOMALY /
    NULL-latest NOT_READY) is under oracle test; the melt, lag window,
    latest-run selection and verdict CASE are all replayed in DuckDB."""
    from bigdime_spark.operators.outliers import metric_trend

    o = _t(spark, sf_dir, "orders")
    prios = o.select(F.col("o_orderpriority").alias("part")).distinct()
    runs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4)], "i int")
    hist = prios.crossJoin(F.broadcast(runs)).select(
        F.concat(F.lit("r"), F.col("i").cast("string")).alias("run_id"),
        "part",
        F.expr(_TREND_VALUE_CASE.format(mi=0)).alias("m_a"),
        F.expr(_TREND_VALUE_CASE.format(mi=1)).alias("m_b"),
    )
    return metric_trend(hist, ["m_a", "m_b"], max_rel_change=0.5)


SQL_METRIC_TREND = f"""
WITH prios AS (SELECT DISTINCT o_orderpriority AS part FROM orders),
runs(i) AS (VALUES (1), (2), (3), (4)),
hist AS (
  SELECT 'r' || CAST(i AS VARCHAR) AS run_id, part, i,
         {_TREND_VALUE_CASE.format(mi=0)} AS m_a,
         {_TREND_VALUE_CASE.format(mi=1)} AS m_b
  FROM prios, runs
),
melted AS (
  SELECT run_id, part, 'm_a' AS metric, m_a AS value FROM hist
  UNION ALL
  SELECT run_id, part, 'm_b' AS metric, m_b AS value FROM hist
),
seq AS (
  SELECT *,
         lag(value) OVER w AS prev_value,
         lag(run_id) OVER w AS prev_run_id,
         row_number() OVER (PARTITION BY part, metric ORDER BY run_id DESC) AS rn
  FROM melted
  WINDOW w AS (PARTITION BY part, metric ORDER BY run_id)
)
SELECT part, metric, run_id,
       round(value, 6) AS value,
       prev_run_id,
       round(prev_value, 6) AS prev_value,
       round(abs(value - prev_value) / nullif(abs(prev_value), 0), 6) AS rel_change,
       CASE
         WHEN value IS NULL OR prev_run_id IS NULL THEN 'NOT_READY'
         WHEN prev_value = 0 AND value <> 0 THEN 'ANOMALY'
         WHEN prev_value IS NULL THEN 'NOT_READY'
         WHEN abs(value - prev_value) / nullif(abs(prev_value), 0) > 0.5
           THEN 'ANOMALY'
         ELSE 'OK'
       END AS verdict
FROM seq WHERE rn = 1
"""


#: shared Spark/DuckDB CASE for the synthetic 6-run z-score history:
#: pattern p = ((first digit of part) - 1) * 2 + mi, mod 6 — the six
#: patterns exercise OK (stable noise, with a NULL prior forcing the
#: even-count interpolated median/MAD), ANOMALY (level jump far off a
#: tight history), MAD-0 constant history with an on-history latest
#: (OK), MAD-0 with an off-history latest (ANOMALY, z NULL), short
#: history (NOT_READY), and NULL latest (NOT_READY).
_ZSCORE_VALUE_CASE = """
CASE ((CAST(substr(part, 1, 1) AS INT) - 1) * 2 + {mi}) % 6
  WHEN 0 THEN CASE WHEN i = 2 THEN NULL
                   WHEN i < 6 THEN 100.0 + (i % 3) ELSE 100.0 END
  WHEN 1 THEN CASE WHEN i < 6 THEN 100.0 + i ELSE 500.0 END
  WHEN 2 THEN 42.0
  WHEN 3 THEN CASE WHEN i < 6 THEN 7.0 ELSE 9.0 END
  WHEN 4 THEN CASE WHEN i >= 5 THEN 10.0 * i ELSE NULL END
  ELSE CASE WHEN i = 6 THEN NULL ELSE 50.0 + i END
END
"""


def q_metric_zscore_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C54: cross-run robust z-score anomaly detection
    (operators/outliers.metric_zscore — deequ's BatchNormalStrategy
    made robust via the Iglewicz–Hoaglin modified z over the FULL
    prior-run history). Input synthesized from orders' five
    priorities × six runs × two metric columns with the shared value
    CASE, so every verdict class — incl. the even-count interpolated
    median/MAD from a NULL-excluded prior and both MAD=0 degradations
    — is under oracle test; the melt, latest/priors split, two exact
    medians and the verdict CASE are all replayed in DuckDB."""
    from bigdime_spark.operators.outliers import metric_zscore

    o = _t(spark, sf_dir, "orders")
    prios = o.select(F.col("o_orderpriority").alias("part")).distinct()
    runs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6)], "i int")
    hist = prios.crossJoin(F.broadcast(runs)).select(
        F.concat(F.lit("r"), F.col("i").cast("string")).alias("run_id"),
        "part",
        F.expr(_ZSCORE_VALUE_CASE.format(mi=0)).alias("m_a"),
        F.expr(_ZSCORE_VALUE_CASE.format(mi=1)).alias("m_b"),
    )
    return metric_zscore(hist, ["m_a", "m_b"], threshold=3.5, min_history=3)


SQL_METRIC_ZSCORE = f"""
WITH prios AS (SELECT DISTINCT o_orderpriority AS part FROM orders),
runs(i) AS (VALUES (1), (2), (3), (4), (5), (6)),
hist AS (
  SELECT 'r' || CAST(i AS VARCHAR) AS run_id, part, i,
         {_ZSCORE_VALUE_CASE.format(mi=0)} AS m_a,
         {_ZSCORE_VALUE_CASE.format(mi=1)} AS m_b
  FROM prios, runs
),
melted AS (
  SELECT run_id, part, 'm_a' AS metric, m_a AS value FROM hist
  UNION ALL
  SELECT run_id, part, 'm_b' AS metric, m_b AS value FROM hist
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY part, metric ORDER BY run_id DESC) AS rn
  FROM melted
),
latest AS (SELECT part, metric, run_id, value FROM ranked WHERE rn = 1),
med AS (
  SELECT part, metric, count(value) AS n_history,
         quantile_cont(value, 0.5) AS med
  FROM ranked WHERE rn > 1 GROUP BY part, metric
),
mad AS (
  SELECT r.part, r.metric,
         quantile_cont(abs(r.value - m.med), 0.5) AS mad
  FROM ranked r JOIN med m ON r.part = m.part AND r.metric = m.metric
  WHERE r.rn > 1 GROUP BY r.part, r.metric
),
scored AS (
  SELECT l.part, l.metric, l.run_id, l.value,
         coalesce(m.n_history, 0) AS n_history, m.med, d.mad,
         0.6745 * (l.value - m.med) / nullif(d.mad, 0) AS z
  FROM latest l
  LEFT JOIN med m ON l.part = m.part AND l.metric = m.metric
  LEFT JOIN mad d ON l.part = d.part AND l.metric = d.metric
)
SELECT part, metric, run_id,
       round(value, 6) AS value,
       n_history,
       round(med, 6) AS med,
       round(mad, 6) AS mad,
       round(z, 6) AS robust_z,
       CASE
         WHEN value IS NULL OR n_history < 3 THEN 'NOT_READY'
         WHEN mad > 0 THEN
           CASE WHEN abs(z) > 3.5 THEN 'ANOMALY' ELSE 'OK' END
         WHEN value <> med THEN 'ANOMALY'
         ELSE 'OK'
       END AS verdict
FROM scored
"""


#: shared Spark/DuckDB value CASE for the EWMA history: six classes
#: covering OK (small z), ANOMALY (spike), constant history + on-it
#: latest (OK via the ewmstd=0 exact-equality degradation), constant
#: history + off-it latest (ANOMALY, z NULL), short non-null history
#: (NOT_READY), and NULL latest (NOT_READY). α = 0.5 keeps every
#: weight a power of two — bit-identical across engines.
_EWMA_VALUE_CASE = """
CASE ((CAST(substr(part, 1, 1) AS INT) - 1) * 2 + {mi}) % 6
  WHEN 0 THEN CASE WHEN i = 6 THEN 12.5 WHEN i = 1 THEN 10.0
                   WHEN i = 2 THEN 12.0 WHEN i = 3 THEN 11.0
                   WHEN i = 4 THEN 13.0 ELSE 12.0 END
  WHEN 1 THEN CASE WHEN i = 6 THEN 100.0 WHEN i = 1 THEN 10.0
                   WHEN i = 2 THEN 12.0 WHEN i = 3 THEN 11.0
                   WHEN i = 4 THEN 13.0 ELSE 12.0 END
  WHEN 2 THEN 42.0
  WHEN 3 THEN CASE WHEN i < 6 THEN 7.0 ELSE 9.0 END
  WHEN 4 THEN CASE WHEN i < 4 THEN NULL ELSE 10.0 * i END
  ELSE CASE WHEN i = 6 THEN NULL ELSE 50.0 + i END
END
"""


def q_metric_ewma_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C56: EWMA anomaly detection (operators/outliers.metric_ewma —
    deequ's OnlineNormalStrategy as a recency-weighted control chart,
    closed-form weights so the identical arithmetic replays in
    DuckDB). Same synthesized-history recipe as C53/C54: orders'
    five priorities × six runs × two metric columns, every verdict
    class under oracle test."""
    from bigdime_spark.operators.outliers import metric_ewma

    o = _t(spark, sf_dir, "orders")
    prios = o.select(F.col("o_orderpriority").alias("part")).distinct()
    runs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6)], "i int")
    hist = prios.crossJoin(F.broadcast(runs)).select(
        F.concat(F.lit("r"), F.col("i").cast("string")).alias("run_id"),
        "part",
        F.expr(_EWMA_VALUE_CASE.format(mi=0)).alias("m_a"),
        F.expr(_EWMA_VALUE_CASE.format(mi=1)).alias("m_b"),
    )
    return metric_ewma(
        hist, ["m_a", "m_b"], alpha=0.5, threshold=3.0, min_history=3
    )


SQL_METRIC_EWMA = f"""
WITH prios AS (SELECT DISTINCT o_orderpriority AS part FROM orders),
runs(i) AS (VALUES (1), (2), (3), (4), (5), (6)),
hist AS (
  SELECT 'r' || CAST(i AS VARCHAR) AS run_id, part, i,
         {_EWMA_VALUE_CASE.format(mi=0)} AS m_a,
         {_EWMA_VALUE_CASE.format(mi=1)} AS m_b
  FROM prios, runs
),
melted AS (
  SELECT run_id, part, 'm_a' AS metric, m_a AS value FROM hist
  UNION ALL
  SELECT run_id, part, 'm_b' AS metric, m_b AS value FROM hist
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY part, metric ORDER BY run_id DESC) AS rn
  FROM melted
),
latest AS (SELECT part, metric, run_id, value FROM ranked WHERE rn = 1),
priors AS (
  SELECT part, metric, value,
         row_number() OVER (PARTITION BY part, metric ORDER BY run_id) AS ord,
         count(*) OVER (PARTITION BY part, metric) AS n
  FROM ranked WHERE rn > 1 AND value IS NOT NULL
),
agg AS (
  SELECT part, metric, CAST(max(n) AS BIGINT) AS n_history,
         sum(CASE WHEN ord = 1 THEN pow(0.5, n - 1)
                  ELSE 0.5 * pow(0.5, n - ord) END * value) AS ewma,
         sum(CASE WHEN ord = 1 THEN pow(0.5, n - 1)
                  ELSE 0.5 * pow(0.5, n - ord) END * value * value) AS m2
  FROM priors GROUP BY part, metric
),
scored AS (
  SELECT l.part, l.metric, l.run_id, l.value,
         coalesce(a.n_history, 0) AS n_history, a.ewma,
         sqrt(greatest(0.0, a.m2 - a.ewma * a.ewma)) AS ewmstd
  FROM latest l
  LEFT JOIN agg a ON l.part = a.part AND l.metric = a.metric
)
SELECT part, metric, run_id,
       round(value, 6) AS value,
       n_history,
       round(ewma, 6) AS ewma,
       round(ewmstd, 6) AS ewmstd,
       round((value - ewma) / nullif(ewmstd, 0), 6) AS z,
       CASE
         WHEN value IS NULL OR n_history < 3 THEN 'NOT_READY'
         WHEN ewmstd > 0 THEN
           CASE WHEN abs((value - ewma) / ewmstd) > 3.0
                THEN 'ANOMALY' ELSE 'OK' END
         WHEN value <> ewma THEN 'ANOMALY'
         ELSE 'OK'
       END AS verdict
FROM scored
"""


#: shared Spark/DuckDB value CASE for the CUSUM history: seven classes
#: covering OK (walk jitter inside the kσ allowance), positive-shift
#: ANOMALY (persistent +2σ walk), constant history + on-it walk (OK via
#: the σ=0 exact-equality degradation), constant history + one off
#: value (ANOMALY, scores NULL), short series (NOT_READY), NULL latest
#: (NOT_READY, stale walk stats reported), and negative-shift ANOMALY.
#: Baseline 10,12,14 → μ=12, σ=2 exactly — every statistic is halves
#: and quarters, bit-identical across engines.
_CUSUM_VALUE_CASE = """
CASE ((CAST(substr(part, 1, 1) AS INT) - 1) * 2 + {mi}) % 7
  WHEN 0 THEN CASE WHEN i = 1 THEN 10.0 WHEN i = 2 THEN 12.0
                   WHEN i = 3 THEN 14.0 WHEN i = 4 THEN 13.0
                   WHEN i = 5 THEN 11.0 ELSE 13.0 END
  WHEN 1 THEN CASE WHEN i = 1 THEN 10.0 WHEN i = 2 THEN 12.0
                   WHEN i = 3 THEN 14.0 ELSE 16.0 END
  WHEN 2 THEN 42.0
  WHEN 3 THEN CASE WHEN i < 6 THEN 7.0 ELSE 9.0 END
  WHEN 4 THEN CASE WHEN i >= 5 THEN 10.0 * i ELSE NULL END
  WHEN 5 THEN CASE WHEN i = 6 THEN NULL ELSE 50.0 + i END
  ELSE CASE WHEN i = 1 THEN 10.0 WHEN i = 2 THEN 12.0
            WHEN i = 3 THEN 14.0 ELSE 8.0 END
END
"""


def q_metric_cusum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C60: CUSUM change-point detection
    (operators/outliers.metric_cusum — Page's cumulative-sum chart in
    its closed prefix-sum/prefix-min form, so the identical window
    arithmetic replays in DuckDB). Same synthesized-history recipe as
    C53/C54/C56: orders' five priorities × six runs × two metric
    columns, all seven verdict classes — incl. both σ=0 degradations,
    the kσ allowance absorbing healthy jitter, and a negative
    persistent shift — under oracle test."""
    from bigdime_spark.operators.outliers import metric_cusum

    o = _t(spark, sf_dir, "orders")
    prios = o.select(F.col("o_orderpriority").alias("part")).distinct()
    runs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6)], "i int")
    hist = prios.crossJoin(F.broadcast(runs)).select(
        F.concat(F.lit("r"), F.col("i").cast("string")).alias("run_id"),
        "part",
        F.expr(_CUSUM_VALUE_CASE.format(mi=0)).alias("m_a"),
        F.expr(_CUSUM_VALUE_CASE.format(mi=1)).alias("m_b"),
    )
    return metric_cusum(
        hist, ["m_a", "m_b"], k_sigma=0.5, h_sigma=4.0, baseline_n=3
    )


SQL_METRIC_CUSUM = f"""
WITH prios AS (SELECT DISTINCT o_orderpriority AS part FROM orders),
runs(i) AS (VALUES (1), (2), (3), (4), (5), (6)),
hist AS (
  SELECT 'r' || CAST(i AS VARCHAR) AS run_id, part, i,
         {_CUSUM_VALUE_CASE.format(mi=0)} AS m_a,
         {_CUSUM_VALUE_CASE.format(mi=1)} AS m_b
  FROM prios, runs
),
melted AS (
  SELECT run_id, part, 'm_a' AS metric, m_a AS value FROM hist
  UNION ALL
  SELECT run_id, part, 'm_b' AS metric, m_b AS value FROM hist
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY part, metric ORDER BY run_id DESC) AS rn
  FROM melted
),
latest AS (SELECT part, metric, run_id, value FROM ranked WHERE rn = 1),
seq AS (
  SELECT part, metric, run_id, value,
         row_number() OVER (PARTITION BY part, metric ORDER BY run_id) AS ord,
         count(*) OVER (PARTITION BY part, metric) AS n
  FROM melted WHERE value IS NOT NULL
),
counts AS (
  SELECT part, metric, CAST(max(n) AS BIGINT) AS n_history
  FROM seq GROUP BY part, metric
),
base AS (
  SELECT part, metric, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM seq WHERE ord <= 3 GROUP BY part, metric
),
walk1 AS (
  SELECT s.part, s.metric, s.run_id, b.mu, b.sigma,
         sum(s.value - b.mu - 0.5 * b.sigma) OVER
           (PARTITION BY s.part, s.metric ORDER BY s.run_id
            ROWS UNBOUNDED PRECEDING) AS p,
         sum(b.mu - s.value - 0.5 * b.sigma) OVER
           (PARTITION BY s.part, s.metric ORDER BY s.run_id
            ROWS UNBOUNDED PRECEDING) AS q,
         abs(s.value - b.mu) AS dev
  FROM seq s JOIN base b ON s.part = b.part AND s.metric = b.metric
  WHERE s.ord > 3
),
walk2 AS (
  SELECT *,
         min(p) OVER (PARTITION BY part, metric ORDER BY run_id
                      ROWS UNBOUNDED PRECEDING) AS minp,
         min(q) OVER (PARTITION BY part, metric ORDER BY run_id
                      ROWS UNBOUNDED PRECEDING) AS minq,
         max(dev) OVER (PARTITION BY part, metric) AS dev_max,
         row_number() OVER (PARTITION BY part, metric ORDER BY run_id DESC) AS rn2
  FROM walk1
),
tail AS (
  SELECT part, metric, mu, sigma,
         (p - least(0.0, minp)) / nullif(sigma, 0) AS cpos,
         (q - least(0.0, minq)) / nullif(sigma, 0) AS cneg,
         dev_max
  FROM walk2 WHERE rn2 = 1
)
SELECT l.part, l.metric, l.run_id,
       round(l.value, 6) AS value,
       coalesce(c.n_history, 0) AS n_history,
       round(t.mu, 6) AS mu,
       round(t.sigma, 6) AS sigma,
       round(CASE WHEN t.sigma > 0 THEN t.cpos END, 6) AS cusum_pos,
       round(CASE WHEN t.sigma > 0 THEN t.cneg END, 6) AS cusum_neg,
       CASE
         WHEN l.value IS NULL OR coalesce(c.n_history, 0) < 4 THEN 'NOT_READY'
         WHEN t.sigma > 0 THEN
           CASE WHEN greatest(t.cpos, t.cneg) > 4.0
                THEN 'ANOMALY' ELSE 'OK' END
         WHEN t.dev_max > 0 THEN 'ANOMALY'
         ELSE 'OK'
       END AS verdict
FROM latest l
LEFT JOIN counts c ON l.part = c.part AND l.metric = c.metric
LEFT JOIN tail t ON l.part = t.part AND l.metric = t.metric
"""


_WEIGHTED_SEED = "r5w"
_WEIGHTED_RATE = 0.5


def q_sample_weighted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C50: deterministic WEIGHTED sample — per-row keep probability =
    clamp(weight) × rate, the quality-weighted soft filter a curation
    pipeline runs after scoring (DCLM/FineWeb-style). Weight here is
    n_chars/1500 (clamps engage above 1500 chars) with NULLs injected
    on doc_id % 97 so the exclude-undefined convention is itself under
    oracle test. Same scan-local md5 predicate as C23a — zero shuffles;
    the oracle replays the hash, the clamp and the per-row threshold
    digit-by-digit (wgt × 0.5 × 2^40 multiplies by powers of two only,
    so the threshold is exact given the shared n_chars/1500.0 double)."""
    from bigdime_spark.operators.sampling import weighted_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d = d.withColumn(
        "wgt",
        F.when(F.col("doc_id") % 97 == 0, F.lit(None).cast("double")).otherwise(
            F.col("n_chars") / F.lit(1500.0)
        ),
    )
    out = weighted_sample(
        d, "doc_id", "wgt", _WEIGHTED_SEED, rate=_WEIGHTED_RATE, keep_hash=True
    )
    return out.select(
        "doc_id",
        F.col("_sample_h").alias("sample_h"),
        F.col("_sample_thr").alias("thr"),
    )


def _weighted_sql() -> str:
    from bigdime_spark.operators.sampling import SAMPLE_SPACE

    thr = (
        f"CAST(floor(least(greatest(n_chars / 1500.0, 0.0), 1.0) "
        f"* {_WEIGHTED_RATE} * {SAMPLE_SPACE}) AS BIGINT)"
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 0 THEN NULL ELSE {thr} END AS thr,
         substr(md5(concat_ws(':', doc_id::VARCHAR, '{_WEIGHTED_SEED}')), 1, 10) AS h
  FROM documents
)
SELECT doc_id, ({_DIGITS}) AS sample_h, thr
FROM w
WHERE ({_DIGITS}) < thr
"""


SQL_SAMPLE_WEIGHTED = _weighted_sql()


def _mix_values_sql() -> str:
    from bigdime_spark.operators.sampling import normalized_weights

    norm = normalized_weights(_MIX_WEIGHTS)
    return ", ".join(
        f"('{dom}', {int(_MIX_TARGET * p)})" for dom, p in sorted(norm.items())
    )


def _sampling_sql() -> tuple[str, str, str, str]:
    from bigdime_spark.operators.sampling import SAMPLE_SPACE, threshold_for_rate

    uniform = f"""
WITH hv AS ({_SAMPLE_H_SQL})
SELECT doc_id, ({_DIGITS}) AS sample_h
FROM hv
WHERE ({_DIGITS}) < {threshold_for_rate(_SAMPLE_RATE)}
"""
    plan_cte = f"""
quotas(source, quota) AS (VALUES {_mix_values_sql()}),
counts AS (SELECT source, count(*) AS n_rows FROM documents GROUP BY source),
plan AS (
  SELECT q.source AS source,
         coalesce(c.n_rows, 0) AS n_rows,
         CAST(q.quota AS BIGINT) AS quota,
         CASE WHEN coalesce(c.n_rows, 0) = 0 THEN 0
              ELSE CAST(floor(least(q.quota / c.n_rows, 1.0) * {SAMPLE_SPACE})
                        AS BIGINT) END AS threshold
  FROM quotas q LEFT JOIN counts c USING (source)
)"""
    mix = f"""
WITH {plan_cte}
SELECT source, n_rows, quota, threshold FROM plan
"""
    stratified = f"""
WITH {plan_cte},
hv AS ({_SAMPLE_H_SQL})
SELECT hv.doc_id AS doc_id, hv.source AS source, ({_DIGITS}) AS sample_h
FROM hv JOIN plan ON hv.source = plan.source
WHERE ({_DIGITS}) < plan.threshold
"""
    shard = f"""
WITH t AS (
  SELECT doc_id, CAST({_WS_TOKENS_SQL} AS BIGINT) AS n_tokens FROM documents
)
SELECT doc_id, n_tokens,
       CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / {_SHARD_BUDGET}) AS BIGINT) AS shard_id
FROM t
"""
    return uniform, mix, stratified, shard


SQL_SAMPLE_UNIFORM, SQL_MIX_PLAN, SQL_SAMPLE_STRATIFIED, SQL_SHARD_PACK = _sampling_sql()


# =====================================================================
# Flagship: the ValidationSuite itself, verdict table vs SQL oracle
# =====================================================================

def q_suite_verdicts_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's flagship path: ONE fused stats+constraints pass +
    uniqueness, run by ValidationSuite over lineitem (part =
    l_returnflag, synthetic key = orderkey-linenumber). The SQL oracle
    reproduces every verdict row independently."""
    li = _t(spark, sf_dir, "lineitem")
    raw = (
        li.withColumn("part", F.col("l_returnflag"))
        .withColumn(
            "image_id",
            F.concat_ws("-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")),
        )
        # B11 through the fused pass: a string ingest column that fails
        # int-parsing on a rare deterministic subset (linestatus letters on
        # ~0.1% of rows) — TypeConformance must FAIL those parts with
        # exact nonconforming counts
        .withColumn(
            "mixed_str",
            F.when(F.col("l_orderkey") % 997 == 0, F.col("l_linestatus")).otherwise(
                F.col("l_orderkey").cast("string")
            ),
        )
    )
    counts = _lineitem_counts(li)
    manifest = (
        counts.filter(F.col("part") != "N")
        .select(
            "part",
            (
                F.col("n_rows")
                + F.when(F.col("part") == "R", F.lit(1)).otherwise(F.lit(0))
            ).cast("long").alias("expected_rows"),
        )
    )
    suite = ValidationSuite(
        declared_schema=raw.schema,
        not_null=("image_id", "l_quantity"),
        check_record_count=True,
        check_checksum=False,
        check_uniqueness=True,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        unique_key="image_id",
        stats=StatsProfile(
            columns=[
                ColumnProfile("l_quantity", numeric=True),
                ColumnProfile("l_extendedprice", numeric=True),
            ]
        ),
        extra_agg_constraints=[
            DomainCheck("qty_positive", F.col("l_quantity") > 0, "l_quantity"),
            DomainCheck(
                "discount_range", F.col("l_discount").between(0.0, 1.0), "l_discount"
            ),
            TypeConformance("mixed_str", "int"),
        ],
    )
    result = suite.run(spark, raw, manifest=manifest, run_id="contract")
    return result.verdicts


SQL_SUITE_VERDICTS = """
WITH c AS (SELECT l_returnflag AS part, count(*) AS n_rows FROM lineitem GROUP BY 1),
     m AS (SELECT part, n_rows + CASE WHEN part = 'R' THEN 1 ELSE 0 END AS expected_rows
           FROM c WHERE part <> 'N')
SELECT '*' AS part, 'schema' AS constraint, 'PASS' AS verdict,
       'mismatches=0' AS observed, 'mismatches=0' AS expected
UNION ALL
SELECT c.part, 'record_count',
       CASE WHEN m.expected_rows IS NULL THEN 'SKIPPED_CONFIG'
            WHEN c.n_rows = m.expected_rows THEN 'PASS' ELSE 'FAIL' END,
       c.n_rows::VARCHAR,
       m.expected_rows::VARCHAR
FROM c LEFT JOIN m USING (part)
UNION ALL
SELECT part, 'not_null.image_id', 'PASS', 'nulls=0', 'nulls=0' FROM c
UNION ALL
SELECT l_returnflag, 'not_null.l_quantity',
       CASE WHEN count(*) - count(l_quantity) = 0 THEN 'PASS' ELSE 'FAIL' END,
       'nulls=' || (count(*) - count(l_quantity))::VARCHAR, 'nulls=0'
FROM lineitem GROUP BY 1
UNION ALL
SELECT l_returnflag, 'domain.qty_positive',
       CASE WHEN count(*) FILTER (WHERE NOT (l_quantity > 0)) = 0 THEN 'PASS' ELSE 'FAIL' END,
       'bad_rows=' || (count(*) FILTER (WHERE NOT (l_quantity > 0)))::VARCHAR, 'bad_rows=0'
FROM lineitem GROUP BY 1
UNION ALL
SELECT l_returnflag, 'domain.discount_range',
       CASE WHEN count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 1.0)) = 0 THEN 'PASS' ELSE 'FAIL' END,
       'bad_rows=' || (count(*) FILTER (WHERE NOT (l_discount BETWEEN 0.0 AND 1.0)))::VARCHAR, 'bad_rows=0'
FROM lineitem GROUP BY 1
UNION ALL
SELECT l_returnflag, 'type_conformance.mixed_str',
       CASE WHEN bad = 0 THEN 'PASS' ELSE 'FAIL' END,
       'nonconforming=' || bad::VARCHAR, 'nonconforming=0'
FROM (
  SELECT l_returnflag,
         count(*) FILTER (
           WHERE TRY_CAST(
             CASE WHEN l_orderkey % 997 = 0 THEN l_linestatus
                  ELSE l_orderkey::VARCHAR END AS INT) IS NULL
           AND (CASE WHEN l_orderkey % 997 = 0 THEN l_linestatus
                     ELSE l_orderkey::VARCHAR END) IS NOT NULL
         ) AS bad
  FROM lineitem GROUP BY 1
)
UNION ALL
SELECT c.part, 'uniqueness.image_id',
       CASE WHEN d.cnt IS NULL THEN 'PASS' ELSE 'FAIL' END,
       CASE WHEN d.cnt IS NULL THEN NULL ELSE 'dup_copies=' || d.cnt::VARCHAR END,
       CASE WHEN d.cnt IS NULL THEN NULL ELSE 'dup_copies=0' END
FROM c LEFT JOIN (
  SELECT l.l_returnflag AS part, count(*) AS cnt
  FROM lineitem l
  JOIN (SELECT l_orderkey, l_linenumber FROM lineitem
        GROUP BY 1, 2 HAVING count(*) > 1) dk
    USING (l_orderkey, l_linenumber)
  GROUP BY 1
) d USING (part)
"""


# =====================================================================
# completeness / structural integrity (C40–C41, B30)
# =====================================================================

def q_null_pattern_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C40 correlated-missingness profile. The testdata tables are
    fully populated, so nullability is SYNTHESIZED deterministically
    (the type-conformance query's established trick): column ``a`` is
    value nulled on event_id % 7 == 0, ``b`` is user_id nulled on
    event_id % 13 < 2 — overlapping masks so the joint distribution
    ('none', 'a', 'b', 'a,b') is non-trivial and the a,b co-occurrence
    rate differs from the product of the marginals."""
    from bigdime_spark.operators.completeness import null_pattern_profile

    ev = _t(spark, sf_dir, "events")
    d = ev.select(
        F.when(F.col("event_id") % 7 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("a"),
        F.when(F.col("event_id") % 13 < 2, F.lit(None))
        .otherwise(F.col("user_id"))
        .alias("b"),
    )
    return null_pattern_profile(d, ["a", "b"], part_col=None)


SQL_NULL_PATTERN = """
WITH d AS (
  SELECT CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS a,
         CASE WHEN event_id % 13 < 2 THEN NULL ELSE user_id END AS b
  FROM events
), pat AS (
  SELECT CASE WHEN concat_ws(',',
              CASE WHEN a IS NULL THEN 'a' END,
              CASE WHEN b IS NULL THEN 'b' END) = ''
         THEN 'none'
         ELSE concat_ws(',',
              CASE WHEN a IS NULL THEN 'a' END,
              CASE WHEN b IS NULL THEN 'b' END) END AS pattern
  FROM d
)
SELECT pattern,
       count(*) AS n_rows,
       round(count(*)::DOUBLE / sum(count(*)) OVER (), 6) AS frac
FROM pat GROUP BY 1
"""


def q_sequence_continuity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30 dense-id continuity, partitioned by priority: o_orderkey is
    globally dense 0..n−1 but each priority part holds an interleaved
    subset, so per-part gaps are large and non-trivial while dups stay
    0 — exactly the shape that separates the gap count from the dup
    count."""
    from bigdime_spark.operators.completeness import sequence_continuity

    o = _t(spark, sf_dir, "orders").withColumn("part", F.col("o_orderpriority"))
    return sequence_continuity(o, "o_orderkey", part_col="part")


SQL_SEQUENCE_CONTINUITY = """
SELECT o_orderpriority AS part,
       count(o_orderkey) AS n_rows,
       count(*) - count(o_orderkey) AS n_null,
       count(DISTINCT o_orderkey) AS n_distinct,
       min(o_orderkey) AS min_id,
       max(o_orderkey) AS max_id,
       CASE WHEN count(DISTINCT o_orderkey) > 0
            THEN max(o_orderkey) - min(o_orderkey) + 1 - count(DISTINCT o_orderkey)
       END AS gaps,
       CASE WHEN count(DISTINCT o_orderkey) > 0
            THEN count(o_orderkey) - count(DISTINCT o_orderkey)
       END AS dups
FROM orders GROUP BY 1
"""


def q_gap_ranges_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B30b — the WHICH-keys companion to sequence_continuity's
    HOW-MANY count (operators/completeness.gap_ranges): distinct
    (priority, key) → lead() per partition → first 3 contiguous holes
    per partition by ascending start (deterministic — hole starts are
    unique within a partition). Same priority-interleaved key space as
    the profile query, so every partition produces real ranges."""
    from bigdime_spark.operators.completeness import gap_ranges

    o = _t(spark, sf_dir, "orders").withColumn("part", F.col("o_orderpriority"))
    return gap_ranges(o, "o_orderkey", part_col="part", max_ranges=3)


SQL_GAP_RANGES = """
WITH ids AS (
  SELECT DISTINCT o_orderpriority AS part, o_orderkey AS id
  FROM orders WHERE o_orderkey IS NOT NULL
), holes AS (
  SELECT part, id + 1 AS gap_start,
         lead(id) OVER (PARTITION BY part ORDER BY id) - 1 AS gap_end,
         lead(id) OVER (PARTITION BY part ORDER BY id) - id - 1 AS gap_len
  FROM ids
), capped AS (
  SELECT part, gap_start, gap_end, gap_len,
         row_number() OVER (PARTITION BY part ORDER BY gap_start) AS rn
  FROM holes WHERE gap_len IS NOT NULL AND gap_len > 0
)
SELECT part, gap_start, gap_end, gap_len
FROM capped WHERE rn <= 3
"""


def q_fd_events_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C41 functional-dependency violation scan: users appearing with
    more than one event_type (a deliberately false FD on this data —
    ~150 violating users at sf0.01, so the top-100 deterministic cap
    engages and the bounded-sample discipline is itself under test)."""
    from bigdime_spark.operators.completeness import fd_violations

    ev = _t(spark, sf_dir, "events")
    return fd_violations(ev, "user_id", "event_type", top_k=100)


SQL_FD_VIOLATIONS = """
SELECT user_id AS det,
       count(DISTINCT event_type) AS n_dep,
       count(*) AS n_rows
FROM events
WHERE user_id IS NOT NULL AND event_type IS NOT NULL
GROUP BY 1
HAVING count(DISTINCT event_type) > 1
ORDER BY n_dep DESC, n_rows DESC, det ASC
LIMIT 100
"""


def q_type_inference_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C42 type-inference profile. Three stringly-typed columns are
    synthesized deterministically from orders: ``mixed`` interleaves
    int / double / date / boolean / plain-string / NULL / timestamp
    renderings by o_orderkey mod 7 (inferring 'string'), ``intish`` is
    pure integral strings (inferring 'bigint'), ``dateish`` pure ISO
    dates (inferring 'date' — narrower than its also-conforming
    timestamp class). Value classes restricted to the cross-engine-
    safe set (no 'yes', no hex, no >int64 literals); the oracle states
    Spark's bigint (integral-string) and boolean (literal-set) cast
    rules explicitly where DuckDB's TRY_CAST is looser."""
    from bigdime_spark.operators.stats import type_inference_profile

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    mixed = (
        F.when(k % 7 == 0, k.cast("string"))
        .when(k % 7 == 1, F.round(F.col("o_totalprice"), 2).cast("string"))
        .when(k % 7 == 2, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(k % 7 == 3, F.when(k % 2 == 0, F.lit("true")).otherwise(F.lit("false")))
        .when(k % 7 == 4, F.col("o_orderpriority"))
        .when(k % 7 == 5, F.lit(None).cast("string"))
        .otherwise(F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
    )
    d = o.select(
        mixed.alias("mixed"),
        k.cast("string").alias("intish"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("dateish"),
    )
    return type_inference_profile(d, ["mixed", "intish", "dateish"], part_col=None)


# Spark cast rules stated explicitly where DuckDB TRY_CAST diverges:
# bigint accepts integral strings only (DuckDB would round '1.5');
# boolean accepts the literal set below (DuckDB rejects 'y'/'yes').
_TI_BIGINT = (
    "(v IS NOT NULL AND regexp_matches(trim(v), '^[+-]?[0-9]+$') "
    "AND TRY_CAST(trim(v) AS HUGEINT) "
    "BETWEEN -9223372036854775808 AND 9223372036854775807)"
)
_TI_BOOL = (
    "(lower(trim(v)) IN ('t','true','y','yes','1','f','false','n','no','0'))"
)

SQL_TYPE_INFERENCE = f"""
WITH d AS (
  SELECT 'mixed' AS col,
    CASE
      WHEN o_orderkey % 7 = 0 THEN o_orderkey::VARCHAR
      WHEN o_orderkey % 7 = 1 THEN round(o_totalprice, 2)::VARCHAR
      WHEN o_orderkey % 7 = 2 THEN strftime(o_orderdate, '%Y-%m-%d')
      WHEN o_orderkey % 7 = 3 THEN
        CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END
      WHEN o_orderkey % 7 = 4 THEN o_orderpriority
      WHEN o_orderkey % 7 = 5 THEN NULL
      ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
    END AS v
  FROM orders
  UNION ALL
  SELECT 'intish', o_orderkey::VARCHAR FROM orders
  UNION ALL
  SELECT 'dateish', strftime(o_orderdate, '%Y-%m-%d') FROM orders
), agg AS (
  SELECT col AS "column",
    count(*) AS n_rows,
    count(*) - count(v) AS n_null,
    count(*) FILTER (WHERE {_TI_BIGINT}) AS n_bigint,
    count(*) FILTER (WHERE TRY_CAST(v AS DOUBLE) IS NOT NULL) AS n_double,
    count(*) FILTER (WHERE TRY_CAST(v AS DATE) IS NOT NULL
                       AND regexp_matches(trim(v),
                           '^[0-9]{{4,}}-[0-9]{{1,2}}-[0-9]{{1,2}}$')) AS n_date,
    count(*) FILTER (WHERE {_TI_BOOL}) AS n_boolean,
    count(*) FILTER (WHERE regexp_matches(trim(v), '^[+-]?[0-9]{{4,}}-')
                       AND NOT regexp_matches(trim(v), '^[+-]?[0-9]+$')
                       AND TRY_CAST(v AS TIMESTAMP) IS NOT NULL) AS n_timestamp
  FROM d GROUP BY 1
)
SELECT *,
  CASE
    WHEN n_rows - n_null = 0 THEN 'empty'
    WHEN n_boolean   = n_rows - n_null THEN 'boolean'
    WHEN n_bigint    = n_rows - n_null THEN 'bigint'
    WHEN n_double    = n_rows - n_null THEN 'double'
    WHEN n_date      = n_rows - n_null THEN 'date'
    WHEN n_timestamp = n_rows - n_null THEN 'timestamp'
    ELSE 'string'
  END AS inferred
FROM agg
"""


def q_benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C46 Benford first-digit profile. Three numeric columns are
    synthesized deterministically from orders: ``price`` is
    o_totalprice as a double (uniform-ish — NOT Benford, which is
    fine: the profile reports the distribution, drift in it is the
    signal); ``logu`` = 10^((o_orderkey % 1000)/1000·3) is log-uniform
    over three decades, i.e. Benford-distributed BY CONSTRUCTION (its
    dev column ≈ 0, the law itself under oracle test); ``mixed``
    interleaves NULL / negative / zero / positive by key mod so every
    eligibility exclusion is exercised. pow with non-integral rational
    exponents is cross-engine safe here because 10^(3m/1000) sits
    measurably far from every digit boundary d·10^j (log10(d)
    irrational vs exponent rational), and the digit extraction's
    round-9-before-floor guard covers the power-of-10 boundary."""
    from bigdime_spark.operators.stats import benford_profile

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    price = F.col("o_totalprice").cast("double")
    logu = F.pow(
        F.lit(10.0), (k % 1000).cast("double") / F.lit(1000.0) * F.lit(3.0)
    )
    mixed = (
        F.when(k % 11 == 0, F.lit(None).cast("double"))
        .when(k % 7 == 0, -price)
        .when(k % 13 == 0, F.lit(0.0))
        .otherwise(price)
    )
    d = o.select(price.alias("price"), logu.alias("logu"), mixed.alias("mixed"))
    return benford_profile(d, ["price", "logu", "mixed"], part_col=None)


def q_mask_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47 format-mask profile. Four stringly-typed columns from
    orders: ``clerk`` (synthesized TPC-H-style Clerk#%09d) / ``priority`` carry fixed formats
    (one mask resp. a handful); ``drift_id`` interleaves TWO id
    schemes plus NULLs by key mod (the format-drift scenario the
    profile hunts — both schemes type-infer 'string'); ``wide_id`` is
    an unpadded number whose mask varies with digit WIDTH, so with
    top_k=4 the deterministic cap itself truncates (n_masks > rank
    max) and is under oracle test. Regex translation is plain
    character classes with global replace — identical semantics in
    Java regex and RE2."""
    from bigdime_spark.operators.stats import mask_profile

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    drift = (
        F.when(k % 5 == 0, F.concat(F.lit("ord_"), k.cast("string"), F.lit("x")))
        .when(k % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ORD-"), F.lpad(k.cast("string"), 9, "0")))
    )
    d = o.select(
        F.concat(
            F.lit("Clerk#"), F.lpad(F.col("o_custkey").cast("string"), 9, "0")
        ).alias("clerk"),
        F.col("o_orderpriority").alias("priority"),
        drift.alias("drift_id"),
        F.concat(F.lit("N"), k.cast("string")).alias("wide_id"),
    )
    return mask_profile(d, ["clerk", "priority", "drift_id", "wide_id"], top_k=4)


SQL_MASK_PROFILE = """
WITH vals AS (
  SELECT 'clerk' AS col, 'Clerk#' || lpad(o_custkey::VARCHAR, 9, '0') AS v FROM orders
  UNION ALL SELECT 'priority', o_orderpriority FROM orders
  UNION ALL SELECT 'drift_id', CASE
      WHEN o_orderkey % 5 = 0 THEN 'ord_' || o_orderkey::VARCHAR || 'x'
      WHEN o_orderkey % 11 = 0 THEN NULL
      ELSE 'ORD-' || lpad(o_orderkey::VARCHAR, 9, '0') END FROM orders
  UNION ALL SELECT 'wide_id', 'N' || o_orderkey::VARCHAR FROM orders
), masked AS (
  SELECT col, regexp_replace(regexp_replace(regexp_replace(v,
    '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'), '[0-9]', '9', 'g') AS mask
  FROM vals
), counts AS (
  SELECT col, mask, count(*) AS n FROM masked GROUP BY 1, 2
), tot AS (
  SELECT col, mask, n,
    SUM(n) OVER (PARTITION BY col) AS n_rows,
    COUNT(*) OVER (PARTITION BY col) AS n_masks,
    ROW_NUMBER() OVER (PARTITION BY col
                       ORDER BY n DESC, mask ASC NULLS FIRST) AS "rank"
  FROM counts
)
SELECT col AS "column", mask, n, n_rows, n_masks,
  round(n / CAST(n_rows AS DOUBLE), 9) AS frac, "rank"
FROM tot WHERE "rank" <= 4
"""


SQL_BENFORD = """
WITH vals AS (
  SELECT 'price' AS col, CAST(o_totalprice AS DOUBLE) AS x FROM orders
  UNION ALL
  SELECT 'logu', pow(10.0, (o_orderkey % 1000) / 1000.0 * 3.0) FROM orders
  UNION ALL
  SELECT 'mixed', CASE
      WHEN o_orderkey % 11 = 0 THEN NULL
      WHEN o_orderkey % 7 = 0 THEN -CAST(o_totalprice AS DOUBLE)
      WHEN o_orderkey % 13 = 0 THEN 0.0
      ELSE CAST(o_totalprice AS DOUBLE) END
  FROM orders
), digits AS (
  -- isfinite() also rejects NaN, which DuckDB would otherwise compare
  -- GREATER than 0 (NaN sorts last here, unlike Spark's false)
  SELECT col, CASE WHEN x IS NOT NULL AND x > 0 AND isfinite(x)
    THEN GREATEST(1, LEAST(9, CAST(FLOOR(
         x / pow(10.0, FLOOR(round(log10(x), 9)))) AS INT)))
    END AS digit
  FROM vals
), counts AS (
  SELECT col, digit, count(*) AS n FROM digits GROUP BY 1, 2
), tot AS (
  SELECT col,
    COALESCE(SUM(n) FILTER (WHERE digit IS NOT NULL), 0) AS n_eligible
  FROM counts GROUP BY 1
), spine AS (
  SELECT t.col, d.digit, t.n_eligible
  FROM tot t CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS digit) d
)
SELECT s.col AS "column", s.digit AS digit,
  COALESCE(c.n, 0) AS n, s.n_eligible AS n_eligible,
  CASE WHEN s.n_eligible = 0 THEN NULL ELSE
    round(COALESCE(c.n, 0) / CAST(s.n_eligible AS DOUBLE), 9) END AS frac,
  round(log10(1.0 + 1.0 / s.digit), 9) AS benford,
  CASE WHEN s.n_eligible = 0 THEN NULL ELSE
    round(abs(COALESCE(c.n, 0) / CAST(s.n_eligible AS DOUBLE)
              - log10(1.0 + 1.0 / s.digit)), 9) END AS dev
FROM spine s LEFT JOIN counts c ON s.col = c.col AND s.digit = c.digit
"""


_FP_SCHEMA = "ordinal int, column string, dtype string, run_id string"


def q_schema_history_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C59 cross-run schema evolution (schema.schema_history): a
    three-run history built from orders' REAL observed fingerprint
    with every status class planted — drop (o_orderpriority gone in
    r3), retype (o_totalprice double→decimal in r3), reorder
    (o_orderstatus ordinal 2→9), add (x_new from r2), flap (flappy in
    r1 and r3 but not r2), and three stable columns. The ranked-run
    span arithmetic, status precedence and detail strings are all
    replayed in DuckDB (the fingerprint itself is hard-coded there —
    it is driver-side metadata; the DIFF is the operator under
    test)."""
    from bigdime_spark.schema import schema_history

    # the history is SCHEMA metadata — only orders' dtypes are read
    # (no scan job). r6 optimization: the run frames used to be seven
    # unioned createDataFrame calls (one per run + one per planted
    # extra); assembling the identical rows driver-side into ONE
    # createDataFrame collapses the 100-node Union plan to a single
    # local scan — same rows, same schema_history output, ~4x less
    # wall on a ~30-row query (guide §7.3 plan-size discipline).
    fp = [
        (i, col, dtype)
        for i, (col, dtype) in enumerate(
            spark.read.parquet(f"{sf_dir}/orders.parquet").dtypes
        )
    ]
    rows = [(i, c, t, "r1") for i, c, t in fp] + [(6, "flappy", "int", "r1")]
    rows += [(i, c, t, "r2") for i, c, t in fp] + [(6, "x_new", "int", "r2")]
    rows += [
        (
            9 if c == "o_orderstatus" else i,
            c,
            "decimal(12,2)" if c == "o_totalprice" else t,
            "r3",
        )
        for i, c, t in fp
        if c != "o_orderpriority"
    ] + [(6, "x_new", "int", "r3"), (7, "flappy", "int", "r3")]
    return schema_history(spark.createDataFrame(rows, _FP_SCHEMA))


SQL_SCHEMA_HISTORY = """
WITH fp(ordinal, col, dtype) AS (VALUES
  (0, 'o_orderkey', 'bigint'), (1, 'o_custkey', 'bigint'),
  (2, 'o_orderstatus', 'string'), (3, 'o_totalprice', 'double'),
  (4, 'o_orderdate', 'timestamp_ntz'), (5, 'o_orderpriority', 'string')),
hist AS (
  SELECT ordinal, col, dtype, 'r1' AS run_id FROM fp
  UNION ALL SELECT 6, 'flappy', 'int', 'r1'
  UNION ALL SELECT ordinal, col, dtype, 'r2' FROM fp
  UNION ALL SELECT 6, 'x_new', 'int', 'r2'
  UNION ALL SELECT CASE WHEN col = 'o_orderstatus' THEN 9 ELSE ordinal END,
    col, CASE WHEN col = 'o_totalprice' THEN 'decimal(12,2)' ELSE dtype END,
    'r3' FROM fp WHERE col <> 'o_orderpriority'
  UNION ALL SELECT 6, 'x_new', 'int', 'r3'
  UNION ALL SELECT 7, 'flappy', 'int', 'r3'
),
runs AS (SELECT DISTINCT run_id FROM hist),
ranked AS (SELECT run_id, row_number() OVER (ORDER BY run_id) AS rk FROM runs),
bounds AS (SELECT min(run_id) AS min_run, max(run_id) AS max_run FROM runs),
per AS (
  SELECT col, count(DISTINCT run_id) AS n_runs, min(run_id) AS first_run,
    max(run_id) AS last_run, count(DISTINCT dtype) AS n_dtypes,
    arg_max(dtype, run_id) AS latest_dtype,
    arg_min(ordinal, run_id) AS first_ordinal,
    arg_max(ordinal, run_id) AS last_ordinal
  FROM hist GROUP BY col
),
j AS (
  SELECT p.*, rf.rk AS rk_first, rl.rk AS rk_last, b.min_run, b.max_run,
         rl.rk - rf.rk + 1 AS span
  FROM per p
  JOIN ranked rf ON p.first_run = rf.run_id
  JOIN ranked rl ON p.last_run = rl.run_id
  CROSS JOIN bounds b
),
scored AS (
  SELECT *,
    CASE WHEN last_run < max_run THEN 'dropped'
         WHEN n_dtypes > 1 THEN 'type_changed'
         WHEN n_runs < span THEN 'intermittent'
         WHEN first_run > min_run THEN 'added'
         WHEN first_ordinal <> last_ordinal THEN 'moved'
         ELSE 'stable' END AS status
  FROM j
)
SELECT col AS "column", status, n_runs, first_run, last_run, latest_dtype,
  CASE status
    WHEN 'dropped' THEN 'last seen in ' || last_run
    WHEN 'type_changed' THEN 'dtypes=' || CAST(n_dtypes AS VARCHAR)
         || ' latest=' || latest_dtype
    WHEN 'intermittent' THEN 'seen ' || CAST(n_runs AS VARCHAR) || '/'
         || CAST(span AS VARCHAR) || ' runs in span'
    WHEN 'added' THEN 'first seen in ' || first_run
    WHEN 'moved' THEN 'ordinal ' || CAST(first_ordinal AS VARCHAR)
         || ' -> ' || CAST(last_ordinal AS VARCHAR)
    ELSE '' END AS detail
FROM scored
"""


def q_suggest_constraints_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C57 constraint suggestion (plans/suggest — deequ's
    ConstraintSuggestion): profile → rules → suggestions, with every
    rule firing at least once. The profiled frame derives from orders:
    the raw columns exercise R1 not_null / R3 unique / R4 non-negative
    / R5 isin; `num_str`/`dbl_str` (stringified keys/prices) exercise
    R6 type-conformance inference; `mostly` (2% planted NULLs over
    o_orderstatus) exercises R2 compliance with the floored
    min_fraction and, with o_orderstatus as the enum dim, R9's
    grouped null-rate bound at the worst group's ceil'd rate. The
    two-level melt aggregation, the value-capture pass, the grouped
    pass-3 and every rule gate are replayed in DuckDB."""
    from bigdime_spark.plans.suggest import (
        suggest_constraints,
        suggestions_frame,
    )

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        F.expr("CAST(o_custkey AS STRING)").alias("num_str"),
        F.expr("CAST(o_totalprice AS STRING)").alias("dbl_str"),
        F.expr(
            "CASE WHEN o_orderkey % 50 = 0 THEN NULL ELSE o_orderstatus END"
        ).alias("mostly"),
    )
    return suggestions_frame(spark, suggest_constraints(o))


# the oracle hard-codes the declared-dtype gates exactly as the engine
# reads them off df.dtypes: numeric = {o_orderkey, o_totalprice},
# string = {o_orderstatus, num_str, dbl_str, mostly}
SQL_SUGGEST = """
WITH melted AS (
  SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS v FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders
  UNION ALL
  SELECT 'num_str', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'dbl_str', CAST(o_totalprice AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'mostly', CASE WHEN o_orderkey % 50 = 0 THEN NULL
                        ELSE o_orderstatus END FROM orders
),
lvl1 AS (SELECT col, v, count(*) AS cnt FROM melted GROUP BY 1, 2),
prof AS (
  SELECT col,
    sum(cnt) AS n_rows,
    coalesce(sum(cnt) FILTER (WHERE v IS NULL), 0) AS n_null,
    count(*) FILTER (WHERE v IS NOT NULL) AS n_distinct,
    coalesce(sum(cnt) FILTER (WHERE v IS NOT NULL
        AND regexp_matches(trim(v), '^[+-]?[0-9]+$')
        AND TRY_CAST(trim(v) AS HUGEINT)
            BETWEEN -9223372036854775808 AND 9223372036854775807),
      0) AS n_bigint,
    coalesce(sum(cnt) FILTER (WHERE v IS NOT NULL
        AND TRY_CAST(v AS DOUBLE) IS NOT NULL), 0) AS n_double,
    min(TRY_CAST(v AS DOUBLE)) FILTER (
      WHERE isfinite(TRY_CAST(v AS DOUBLE))) AS min_num,
    max(TRY_CAST(v AS DOUBLE)) FILTER (
      WHERE isfinite(TRY_CAST(v AS DOUBLE))) AS max_num,
    max(length(v)) AS max_len,
    col IN ('o_orderstatus', 'num_str', 'dbl_str', 'mostly') AS is_string,
    col IN ('o_orderkey', 'o_totalprice') AS is_numeric
  FROM lvl1 GROUP BY col
),
gated AS (
  SELECT col FROM prof
  WHERE is_string AND n_distinct BETWEEN 1 AND 10
    AND n_rows >= 10 * n_distinct
),
vals AS (
  SELECT l.col,
    string_agg('''' || replace(l.v, '''', '''''') || '''', ','
               ORDER BY l.v) AS vlist
  FROM lvl1 l JOIN gated g ON l.col = g.col
  WHERE l.v IS NOT NULL GROUP BY l.col
),
rules AS (
  SELECT col, 'not_null' AS chk, '' AS params, n_rows, n_null, n_distinct
  FROM prof WHERE n_rows > 0 AND n_null = 0
  UNION ALL
  SELECT col, 'compliance',
    '`' || col || '` IS NOT NULL|min_fraction=' ||
      CAST(floor((1.0 - n_null / CAST(n_rows AS DOUBLE)) * 100) / 100
           AS VARCHAR),
    n_rows, n_null, n_distinct
  FROM prof WHERE n_rows > 0 AND n_null > 0
    AND n_null / CAST(n_rows AS DOUBLE) <= 0.05
  UNION ALL
  SELECT col, 'unique', '', n_rows, n_null, n_distinct
  FROM prof WHERE n_rows >= 2 AND n_null = 0 AND n_distinct = n_rows
  UNION ALL
  SELECT col, 'domain_check', '`' || col || '` >= 0',
         n_rows, n_null, n_distinct
  FROM prof WHERE n_rows > 0 AND is_numeric
    AND min_num IS NOT NULL AND min_num >= 0
  UNION ALL
  SELECT p.col, 'domain_check', '`' || p.col || '` IN (' || v.vlist || ')',
         p.n_rows, p.n_null, p.n_distinct
  FROM prof p JOIN vals v ON p.col = v.col WHERE p.n_rows > 0
  UNION ALL
  SELECT col, 'type_conformance',
    CASE WHEN n_bigint = n_rows - n_null THEN 'bigint' ELSE 'double' END,
    n_rows, n_null, n_distinct
  FROM prof
  WHERE n_rows > 0 AND is_string AND n_rows - n_null > 0
    AND col NOT IN (SELECT col FROM gated)
    AND (n_bigint = n_rows - n_null OR n_double = n_rows - n_null)
  UNION ALL
  SELECT col, 'domain_check',
    'length(`' || col || '`) <= ' ||
    CAST(CAST(pow(2, CASE WHEN max_len <= 1 THEN 0
                          ELSE ceil(log2(max_len)) END) AS BIGINT)
         AS VARCHAR),
    n_rows, n_null, n_distinct
  FROM prof
  WHERE n_rows > 0 AND is_string AND n_rows - n_null > 0
    AND max_len IS NOT NULL
  UNION ALL
  SELECT col, 'drift_spec',
    'lo=' || CAST(floor(min_num) AS VARCHAR) ||
    '|hi=' || CAST(CASE WHEN ceil(max_num) <= floor(min_num)
                        THEN floor(min_num) + 1.0
                        ELSE ceil(max_num) END AS VARCHAR) ||
    '|nbins=32',
    n_rows, n_null, n_distinct
  FROM prof
  WHERE n_rows > 0 AND is_numeric
    AND min_num IS NOT NULL AND max_num IS NOT NULL
  UNION ALL
  -- R9: the one (dirty x enum-dim) pair this frame produces is
  -- (mostly, o_orderstatus); worst per-group null rate over groups
  -- with >= min_support rows, ceil'd to 2 decimals after the fp-noise
  -- round (the engine's math.ceil(round(r*100, 6))/100)
  SELECT p.col, 'grouped_bound',
    'group_by=o_orderstatus|metric=null_rate|hi=' || r9.hi_txt ||
    '|min_support=10',
    p.n_rows, p.n_null, p.n_distinct
  FROM prof p, (
    SELECT CAST(least(1.0,
             ceil(round(max(gnull / CAST(gn AS DOUBLE)) * 100, 6)) / 100)
           AS VARCHAR) AS hi_txt
    FROM (SELECT o_orderstatus AS gv, count(*) AS gn,
                 count(*) FILTER (WHERE o_orderkey % 50 = 0) AS gnull
          FROM orders GROUP BY 1)
    WHERE gn >= 10
  ) r9
  WHERE p.col = 'mostly' AND r9.hi_txt IS NOT NULL
)
SELECT col AS "column", chk AS "check", params, n_rows, n_null, n_distinct
FROM rules
"""


def q_slice_lift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation-slice lift (operators/slices.violation_slices, C69):
    which value segments concentrate a failing predicate. Predicate =
    value > 150 (the tail of the events value distribution), sliced
    by event_type, a derived user shard (user_id % 8), and their
    pair — single dims AND the pair dim exercise the one-scan
    explode+agg path; lift arithmetic (slice rate / global rate) is
    replayed exactly in SQL."""
    from bigdime_spark.operators.slices import violation_slices

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 8).alias("user_shard"),
        "value",
    )
    return violation_slices(
        e,
        F.col("value") > 150,
        ["event_type", "user_shard"],
        include_pairs=True,
    )


SQL_SLICE_LIFT = """
WITH base AS (
  SELECT event_type,
         CAST(user_id % 8 AS VARCHAR) AS user_shard,
         CASE WHEN value > 150 THEN 1 ELSE 0 END AS v
  FROM events
), g AS (
  SELECT count(*) AS gn, sum(v) AS gv FROM base
), slices AS (
  SELECT 'event_type' AS dim, event_type AS value, count(*) AS n, sum(v) AS nv
  FROM base GROUP BY 2
  UNION ALL
  SELECT 'user_shard', user_shard, count(*), sum(v) FROM base GROUP BY 2
  UNION ALL
  SELECT 'event_type×user_shard',
         concat_ws('|', coalesce(event_type, '∅'), coalesce(user_shard, '∅')),
         count(*), sum(v)
  FROM base GROUP BY 2
)
SELECT dim, value, n, CAST(nv AS BIGINT) AS n_viol,
       round(nv::DOUBLE / n, 6) AS viol_rate,
       round(gv::DOUBLE / gn, 6) AS global_rate,
       CASE WHEN gv > 0
            THEN round((nv::DOUBLE / n) / (gv::DOUBLE / gn), 6) END AS lift
FROM slices, g
"""


# =====================================================================
# registry / driver surface
# =====================================================================

REGISTRY: dict[str, QuerySpec] = {
    # per-column stats (B1–B8)
    "stats_profile_lineitem": QuerySpec(q_stats_profile_lineitem, SQL_STATS_PROFILE),
    "minmax_orders": QuerySpec(q_minmax_orders, SQL_MINMAX_ORDERS),
    "quantiles_lineitem": QuerySpec(q_quantiles_lineitem, SQL_QUANTILES),
    "null_rate_events": QuerySpec(q_null_rate_events, SQL_NULL_RATE),
    "freshness_events": QuerySpec(q_freshness_events, SQL_FRESHNESS),
    "part_diff_orders": QuerySpec(q_part_diff_orders, SQL_PART_DIFF),
    "zone_overlap_orders": QuerySpec(q_zone_overlap_orders, SQL_ZONE_OVERLAP),
    "dup_parts_orders": QuerySpec(q_dup_parts_orders, SQL_DUP_PARTS),
    "correlation_lineitem": QuerySpec(q_correlation_lineitem, SQL_CORRELATION),
    "correlation_shift_lineitem": QuerySpec(
        q_correlation_shift_lineitem, SQL_CORRELATION_SHIFT
    ),
    "hll_distinct_partkey": QuerySpec(q_hll_distinct_partkey, None),  # B6: estimator-specific
    "distinct_partkey_exact": QuerySpec(q_distinct_partkey_exact, SQL_DISTINCT_EXACT),
    # validators (B12–B17, B22)
    "record_count_check": QuerySpec(q_record_count_check, SQL_RECORD_COUNT),
    "uniqueness_lineitem_key": QuerySpec(q_uniqueness_lineitem_key, SQL_UNIQUENESS_LINEITEM),
    "dup_groups_events_user": QuerySpec(q_dup_groups_events_user, SQL_DUP_GROUPS_EVENTS),
    "referential_counts": QuerySpec(q_referential_counts, SQL_REFERENTIAL_COUNTS),
    "referential_orphan_orders": QuerySpec(q_referential_orphan_orders, SQL_REFERENTIAL_ORPHANS),
    "referential_bloom_customer": QuerySpec(
        q_referential_bloom_customer, SQL_REFERENTIAL_BLOOM
    ),
    "domain_violations": QuerySpec(q_domain_violations, SQL_DOMAIN_VIOLATIONS),
    "compliance_events": QuerySpec(q_compliance_events, SQL_COMPLIANCE),
    "categorical_drift_orders": QuerySpec(q_categorical_drift_orders, SQL_CATEGORICAL_DRIFT),
    "content_diff_orders": QuerySpec(q_content_diff_orders, SQL_CONTENT_DIFF),
    "embedding_drift": QuerySpec(q_embedding_drift, SQL_EMBEDDING_DRIFT),
    "categorical_profile_documents": QuerySpec(
        q_categorical_profile_documents, SQL_CATEGORICAL_PROFILE
    ),
    "distinctness_documents": QuerySpec(
        q_distinctness_documents, SQL_DISTINCTNESS
    ),
    "distinctness_from_stats_documents": QuerySpec(
        q_distinctness_from_stats_documents, SQL_DISTINCTNESS_FROM_STATS
    ),
    "mutual_info_documents": QuerySpec(q_mutual_info_documents, SQL_MUTUAL_INFO),
    "mutual_info_shift_documents": QuerySpec(
        q_mutual_info_shift_documents, SQL_MUTUAL_INFO_SHIFT
    ),
    "type_conformance_orders": QuerySpec(q_type_conformance_orders, SQL_TYPE_CONFORMANCE),
    "checksum_lineitem": QuerySpec(q_checksum_lineitem, SQL_CHECKSUM),
    "drift_w1_js_extendedprice": QuerySpec(q_drift_w1_js_extendedprice, SQL_DRIFT_W1_JS),
    "drift_buckets_extendedprice": QuerySpec(
        q_drift_buckets_extendedprice, SQL_DRIFT_BUCKETS
    ),
    "sampled_gate_lineitem": QuerySpec(q_sampled_gate_lineitem, SQL_SAMPLED_GATE),
    "stratified_gate_lineitem": QuerySpec(
        q_stratified_gate_lineitem, SQL_STRATIFIED_GATE
    ),
    "grouped_profile_events": QuerySpec(q_grouped_profile_events, SQL_GROUPED_PROFILE),
    "caption_quality_documents": QuerySpec(
        q_caption_quality_documents, SQL_CAPTION_QUALITY
    ),
    "caption_lang_documents": QuerySpec(q_caption_lang_documents, SQL_CAPTION_LANG),
    "grouped_verdict_events": QuerySpec(q_grouped_verdict_events, SQL_GROUPED_VERDICT),
    # drift (B18/B19)
    "drift_extendedprice": QuerySpec(q_drift_extendedprice, SQL_DRIFT_EXTENDEDPRICE),
    "drift_events_value": QuerySpec(q_drift_events_value, SQL_DRIFT_EVENTS),
    "drift_not_ready_events": QuerySpec(q_drift_not_ready_events, SQL_DRIFT_NOT_READY),
    "drift_cross_run_orders": QuerySpec(q_drift_cross_run_orders, SQL_DRIFT_CROSS_RUN),
    "stats_outlier_parts": QuerySpec(q_stats_outlier_parts, SQL_STATS_OUTLIERS),
    "drift_table_rollup_orders": QuerySpec(
        q_drift_table_rollup_orders, SQL_DRIFT_CROSS_RUN
    ),
    "quantiles_from_stats_orders": QuerySpec(
        q_quantiles_from_stats_orders, SQL_QUANTILES_FROM_STATS
    ),
    "quantiles_rollup_orders": QuerySpec(
        q_quantiles_rollup_orders, SQL_QUANTILES_ROLLUP
    ),
    "drift_multipart_lineitem": QuerySpec(q_drift_multipart_lineitem, SQL_DRIFT_MULTIPART),
    # windows / scalar funcs (B23–B25, §2.6)
    "topk_orders_per_priority": QuerySpec(q_topk_orders_per_priority, SQL_TOPK_ORDERS),
    "events_json_extract": QuerySpec(q_events_json_extract, SQL_EVENTS_JSON),
    # text analysis
    "token_stats_documents": QuerySpec(q_token_stats_documents, SQL_TOKEN_STATS),
    "quality_documents": QuerySpec(q_quality_documents, SQL_QUALITY),
    "repetition_documents": QuerySpec(q_repetition_documents, SQL_REPETITION),
    "pii_documents": QuerySpec(q_pii_documents, SQL_PII),
    "langid_documents": QuerySpec(q_langid_documents, SQL_LANGID),
    "fingerprint_documents": QuerySpec(q_fingerprint_documents, SQL_FINGERPRINT),
    "bit_balance_documents": QuerySpec(q_bit_balance_documents, SQL_BIT_BALANCE),
    "rolling_fingerprint_documents": QuerySpec(
        q_rolling_fingerprint_documents, SQL_ROLLING_FINGERPRINT
    ),
    # dedup
    "dedup_exact_documents": QuerySpec(q_dedup_exact_documents, SQL_DEDUP_EXACT),
    "dedup_exact_bounded_sample": QuerySpec(
        q_dedup_exact_bounded_sample, SQL_DEDUP_EXACT_BOUNDED
    ),
    "dedup_minhash_lsh": QuerySpec(q_dedup_minhash_lsh, SQL_DEDUP_MINHASH),
    "dedup_simhash": QuerySpec(q_dedup_simhash, SQL_DEDUP_SIMHASH),
    "dedup_simhash_hamming": QuerySpec(q_dedup_simhash_hamming, SQL_DEDUP_SIMHASH_HAMMING),
    "dedup_simhash_hamming_wide": QuerySpec(
        q_dedup_simhash_hamming_wide, SQL_DEDUP_SIMHASH_HAMMING_WIDE
    ),
    "dedup_phash_hamming": QuerySpec(q_dedup_phash_hamming, SQL_DEDUP_PHASH_HAMMING),
    "dedup_phash_clusters": QuerySpec(q_dedup_phash_clusters, SQL_DEDUP_PHASH_CLUSTERS),
    "dedup_phash_clusters_star": QuerySpec(
        q_dedup_phash_clusters_star, SQL_DEDUP_PHASH_CLUSTERS
    ),
    "dedup_ngram_jaccard": QuerySpec(q_dedup_ngram_jaccard, SQL_NGRAM_JACCARD),
    # asymmetric containment near-dup (C61)
    "dedup_containment": QuerySpec(q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "dedup_consensus": QuerySpec(q_dedup_consensus, _consensus_sql()),
    # caption<->image consistency (C62)
    "caption_conflicts": QuerySpec(q_caption_conflicts, SQL_CAPTION_CONFLICTS),
    "caption_stock": QuerySpec(q_caption_stock, SQL_CAPTION_STOCK),
    "contamination_documents": QuerySpec(
        q_contamination_documents, SQL_CONTAMINATION
    ),
    "phash_contamination": QuerySpec(
        q_phash_contamination, SQL_PHASH_CONTAMINATION
    ),
    "hot_grams_documents": QuerySpec(q_hot_grams_documents, SQL_HOT_GRAMS),
    "dup_gram_docs": QuerySpec(q_dup_gram_docs, SQL_DUP_GRAMS),
    # KMV distinct-overlap sketches (C68)
    "kmv_overlap_orders": QuerySpec(q_kmv_overlap_orders, SQL_KMV_OVERLAP),
    "kmv_churn_orders": QuerySpec(q_kmv_churn_orders, SQL_KMV_CHURN),
    # exact-substring dedup spans (C67)
    "repeated_spans_documents": QuerySpec(
        q_repeated_spans_documents, SQL_REPEATED_SPANS
    ),
    "span_coverage_documents": QuerySpec(
        q_span_coverage_documents, SQL_SPAN_COVERAGE
    ),
    # similarity search
    "ann_cosine_topk": QuerySpec(q_ann_cosine_topk, SQL_ANN_TOPK),
    # SQ8 scalar-quantized ANN (C63)
    "ann_sq_topk": QuerySpec(q_ann_sq_topk, SQL_ANN_SQ),
    "ann_pq_topk": QuerySpec(q_ann_pq_topk, SQL_ANN_PQ),
    "ann_ivfpq_topk": QuerySpec(q_ann_ivfpq_topk, SQL_ANN_IVFPQ),
    "ivf_cell_profile": QuerySpec(q_ivf_cell_profile, SQL_IVF_CELL_PROFILE),
    "embedding_integrity": QuerySpec(q_embedding_integrity, SQL_EMBEDDING_INTEGRITY),
    "ann_ivf_topk": QuerySpec(q_ann_ivf_topk, SQL_ANN_IVF),
    "ivf_recall_curve": QuerySpec(q_ivf_recall_curve, SQL_IVF_RECALL_CURVE),
    "ann_ivf_trained_topk": QuerySpec(q_ann_ivf_trained_topk, SQL_ANN_IVF_TRAINED),
    "ann_lsh_nn": QuerySpec(q_ann_lsh_nn, SQL_ANN_LSH),
    "ann_hyperplane_recall": QuerySpec(q_ann_hyperplane_recall, SQL_ANN_HYPERPLANE_RECALL),
    "embedding_sim_histogram": QuerySpec(q_embedding_sim_histogram, SQL_SIM_HISTOGRAM),
    "embedding_sim_histogram_sampled": QuerySpec(
        q_embedding_sim_histogram_sampled, SQL_SIM_HISTOGRAM_SAMPLED
    ),
    "dedup_embedding_cosine": QuerySpec(q_dedup_embedding_cosine, SQL_DEDUP_EMBEDDING),
    "dedup_embedding_ivf": QuerySpec(q_dedup_embedding_ivf, SQL_DEDUP_EMBEDDING_IVF),
    # skew (B27)
    "salted_groupby_events": QuerySpec(q_salted_groupby_events, SQL_SALTED_GROUPBY),
    # sampling / curation (C23–C24)
    "sample_uniform_documents": QuerySpec(q_sample_uniform_documents, SQL_SAMPLE_UNIFORM),
    "mix_plan_documents": QuerySpec(q_mix_plan_documents, SQL_MIX_PLAN),
    "sample_stratified_documents": QuerySpec(
        q_sample_stratified_documents, SQL_SAMPLE_STRATIFIED
    ),
    "shard_pack_documents": QuerySpec(q_shard_pack_documents, SQL_SHARD_PACK),
    "sample_weighted_documents": QuerySpec(
        q_sample_weighted_documents, SQL_SAMPLE_WEIGHTED
    ),
    "verdict_history_orders": QuerySpec(
        q_verdict_history_orders, SQL_VERDICT_HISTORY
    ),
    "metric_trend_orders": QuerySpec(q_metric_trend_orders, SQL_METRIC_TREND),
    "metric_zscore_orders": QuerySpec(q_metric_zscore_orders, SQL_METRIC_ZSCORE),
    "metric_ewma_orders": QuerySpec(q_metric_ewma_orders, SQL_METRIC_EWMA),
    # CUSUM change-point detection (C60)
    "metric_cusum_orders": QuerySpec(q_metric_cusum_orders, SQL_METRIC_CUSUM),
    # completeness / structural integrity (C40–C41, B30)
    "null_pattern_events": QuerySpec(q_null_pattern_events, SQL_NULL_PATTERN),
    "sequence_continuity_orders": QuerySpec(
        q_sequence_continuity_orders, SQL_SEQUENCE_CONTINUITY
    ),
    "gap_ranges_orders": QuerySpec(q_gap_ranges_orders, SQL_GAP_RANGES),
    "fd_events_user_type": QuerySpec(q_fd_events_user_type, SQL_FD_VIOLATIONS),
    "type_inference_orders": QuerySpec(q_type_inference_orders, SQL_TYPE_INFERENCE),
    "benford_orders": QuerySpec(q_benford_orders, SQL_BENFORD),
    "mask_profile_orders": QuerySpec(q_mask_profile_orders, SQL_MASK_PROFILE),
    # cross-run schema evolution (C59)
    "schema_history_orders": QuerySpec(
        q_schema_history_orders, SQL_SCHEMA_HISTORY
    ),
    # constraint suggestion (C57)
    "suggest_constraints_orders": QuerySpec(
        q_suggest_constraints_orders, SQL_SUGGEST
    ),
    # flagship suite
    "slice_lift_events": QuerySpec(q_slice_lift_events, SQL_SLICE_LIFT),
    "suite_verdicts_lineitem": QuerySpec(q_suite_verdicts_lineitem, SQL_SUITE_VERDICTS),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in REGISTRY.items() if spec.sql is not None}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke query: the full ValidationSuite verdict table on
    the sf0.001 corpus."""
    return q_suite_verdicts_lineitem(spark, SF_SMOKE)
