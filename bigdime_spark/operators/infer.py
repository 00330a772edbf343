"""Statistical certification of SAMPLED checks (SURVEY C71).

A sampled validation ("decode 20% of each part") observes k violations
among n sampled rows; the honest question is about the POPULATION
rate. "0 bad in the sample" certifies nothing by itself — this module
turns (k, n) into a Wilson score interval [Wilson 1927, JASA 22] and a
three-way verdict against a declared tolerance:

* PASS      — the interval's upper bound is ≤ max_rate: the population
  violation rate is certified under the tolerance at the chosen
  confidence;
* FAIL      — the lower bound exceeds max_rate: certified OVER the
  tolerance (a sampled FAIL is always a real page);
* NOT_READY — the interval straddles the tolerance (or the part has
  zero sampled rows): the sample is too small to certify either way.
  The fix is a higher sample rate, and ``min_n_to_certify`` says how
  high: the smallest n that can PASS a clean sample.

Wilson (not normal-approx ±z√(p̂q̂/n)) because sampled validation lives
in the small-k corner where the normal interval collapses to a lying
[0, 0] at k=0; Wilson's k=0 upper bound z²/(n+z²) is exactly the
"rule of three"-grade statement a gate needs. Exact Clopper–Pearson
needs a beta inverse — not expressible as plan arithmetic nor in the
DuckDB oracle; Wilson is closed-form and replays bit-exactly.

Everything here is pure column arithmetic over an already-aggregated
(part, n, k) frame — metadata-scale at any corpus size, zero extra
scans beyond the count the sampled check already pays.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdime_spark.schema import FAIL, NOT_READY, PASS

#: two-sided 95% — the conventional default; callers pass their own z
#: for other confidences (2.576 → 99%).
Z_95 = 1.96


def wilson_bounds(k: Column, n: Column, z: float) -> tuple[Column, Column]:
    """Wilson score interval [lower, upper] for a binomial proportion,
    as closed-form column arithmetic (term order mirrored by the
    DuckDB oracle so the floats replay bit-exactly). NULL when n is
    NULL or 0."""
    z2 = z * z
    nn = n.cast("double")
    phat = k.cast("double") / nn
    denom = 1.0 + z2 / nn
    center = (phat + z2 / (2.0 * nn)) / denom
    half = (
        F.lit(z) * F.sqrt(phat * (1.0 - phat) / nn + z2 / (4.0 * nn * nn))
    ) / denom
    guard = n.isNull() | (n <= 0)
    lower = F.when(guard, F.lit(None)).otherwise(F.greatest(F.lit(0.0), center - half))
    upper = F.when(guard, F.lit(None)).otherwise(F.least(F.lit(1.0), center + half))
    return lower, upper


def min_n_to_certify(max_rate: float, z: float = Z_95) -> int:
    """Smallest sample size that CAN pass the gate: with k=0 the
    Wilson upper bound is z²/(n+z²), so certifying rate ≤ max_rate
    needs n ≥ z²(1−max_rate)/max_rate. The planning number for
    choosing a sample rate: rate ≥ min_n / min(part sizes)."""
    if not 0.0 < max_rate < 1.0:
        raise ValueError(f"max_rate must be in (0, 1), got {max_rate}")
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    return math.ceil(z * z * (1.0 - max_rate) / max_rate)


def sampled_rate_gate(
    counts: DataFrame,
    max_rate: float,
    z: float = Z_95,
    n_col: str = "n",
    k_col: str = "k",
) -> DataFrame:
    """Gate an aggregated (…, n sampled, k violating) frame against a
    population-rate tolerance → adds (rate_hat, ci_lo, ci_hi, verdict)
    per input row. Verdict vocabulary is the engine's: PASS / FAIL /
    NOT_READY (see module docstring). max_rate must be strictly inside
    (0, 1): a zero tolerance is unsatisfiable from any finite sample
    (the k=0 upper bound is always positive) — callers wanting "no
    violations at all" should sample at rate 1.0 and use the exact
    check instead."""
    if not 0.0 < max_rate < 1.0:
        raise ValueError(f"max_rate must be in (0, 1), got {max_rate}")
    if z <= 0:
        raise ValueError(f"z must be > 0, got {z}")
    n, k = F.col(n_col), F.col(k_col)
    lower, upper = wilson_bounds(k, n, z)
    verdict = (
        F.when(n.isNull() | (n <= 0), F.lit(NOT_READY))
        .when(lower > max_rate, F.lit(FAIL))
        .when(upper <= max_rate, F.lit(PASS))
        .otherwise(F.lit(NOT_READY))
    )
    return (
        counts.withColumn("rate_hat", F.try_divide(k.cast("double"), n))
        .withColumn("ci_lo", lower)
        .withColumn("ci_hi", upper)
        .withColumn("verdict", verdict)
    )


def stratified_thresholds(
    df: DataFrame,
    strata_col: str,
    base_rate: float,
    min_n: int,
    part_col: str = "part",
) -> DataFrame:
    """Per-(part, stratum) deterministic keep-thresholds for a
    coverage-GUARANTEED sample (SURVEY C77): rate_s = max(base_rate,
    min_n / n_s), clamped to 1 — a stratum too small for the base rate
    to surface (the rare fmt that is 0.01% of the corpus) gets its
    rate boosted until ~min_n of its rows are expected in the sample,
    while bulk strata stay at base_rate. min_n comes straight from
    ``min_n_to_certify``: sample enough PER STRATUM that a clean
    stratum can be certified, instead of the uniform sample silently
    leaving rare strata unvalidated.

    → (part, <strata_col>, n_pop, threshold) — parts × strata rows,
    broadcastable; ONE column-pruned count aggregation (the payload is
    never read). Thresholds are exact integer arithmetic over the
    40-bit md5 sample space, so the selection replays bit-identically
    in the DuckDB oracle and under any repartitioning."""
    from bigdime_spark.operators.sampling import SAMPLE_SPACE, threshold_for_rate

    if not 0.0 < base_rate <= 1.0:
        raise ValueError(f"base_rate must be in (0, 1], got {base_rate}")
    if min_n < 0:
        raise ValueError(f"min_n must be >= 0, got {min_n}")
    base_thr = threshold_for_rate(base_rate)
    n = F.col("n_pop").cast("double")
    boosted = F.ceil(F.lit(float(SAMPLE_SPACE)) * F.lit(float(min_n)) / n).cast(
        "long"
    )
    return (
        df.groupBy(F.col(part_col).alias("part"), F.col(strata_col))
        .agg(F.count(F.lit(1)).alias("n_pop"))
        .withColumn(
            "threshold",
            F.least(
                F.lit(SAMPLE_SPACE).cast("long"),
                F.greatest(F.lit(base_thr).cast("long"), boosted),
            ),
        )
    )


def stratified_sample_frame(
    df: DataFrame,
    strata_col: str,
    thresholds: DataFrame,
    seed: str,
    id_col: str = "image_id",
    part_col: str = "part",
) -> DataFrame:
    """Apply per-stratum thresholds as a deterministic hash filter:
    keep row iff md5-hash(id, seed) < its (part, stratum) threshold.
    The thresholds frame is parts × strata — explicitly broadcast, so
    the corpus never shuffles to be sampled (the one departure from
    uniform_sample's pure scan-local predicate, priced at a broadcast
    hash join). The join is NULL-SAFE on both keys (sentinel-encoded):
    a NULL stratum is a real segment (the C72 convention) — an
    equi-join would silently drop every NULL-fmt row from the sample,
    which is exactly the coverage loss this sampler exists to
    prevent."""
    from bigdime_spark.operators.sampling import sample_hash

    thr = thresholds.select(
        _nskey(F.col("part")).alias("_pk"),
        _nskey(F.col(strata_col)).alias("_sk"),
        "threshold",
    )
    return (
        df.withColumn("_pk", _nskey(F.col(part_col)))
        .withColumn("_sk", _nskey(F.col(strata_col)))
        .join(F.broadcast(thr), ["_pk", "_sk"])
        .filter(sample_hash(F.col(id_col), seed) < F.col("threshold"))
        .drop("_pk", "_sk", "threshold")
    )


def _nskey(c: Column) -> Column:
    """Null-safe string join key: NULL → a sentinel no real value can
    collide with (contains NUL)."""
    return F.coalesce(c.cast("string"), F.lit("\x00null"))
