"""KS + PSI distribution drift, raw vs curated (SURVEY B18/B19).

BASELINE.json:6,14: "KS/PSI distribution-drift tests on width/height/
phash histograms". Spark's only KS primitive is one-sample-vs-
theoretical (pyspark.ml.stat.KolmogorovSmirnovTest), so the
two-sample statistic is built from binned ECDFs:

    D = max_b | ECDF_raw(b) − ECDF_cur(b) |   over shared fixed bins
    reject at α=0.05 when D > 1.358·√((n+m)/(n·m))

Binned KS under-estimates the exact D by at most one bin width of
probability mass (documented bound, SURVEY §7). PSI over the same
bins with ε-smoothing; industry convention PASS < 0.10 ≤ WARN < 0.25
≤ FAIL.

Plan shape: one (part, bucket) hash-agg per snapshot (map-side
partial), a full-outer join on tiny histogram relations (≤ parts ×
(nbins+2) rows), window cumsums — all driver-light, all JVM-side.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bigdime_spark.functions.histograms import bucket_col
from bigdime_spark.operators.base import SuiteContext, TableConstraint, fill_pass_for_missing_parts
from bigdime_spark.schema import FAIL, NOT_READY, PASS

KS_ALPHA_COEFF = 1.358  # c(α) at α = 0.05
PSI_FAIL = 0.25
PSI_EPS = 1e-6


@dataclass
class DriftColumn:
    column: str
    lo: float
    hi: float
    nbins: int = 32


DEFAULT_DRIFT_COLUMNS = (
    DriftColumn("w", 0.0, 256.0, 32),
    DriftColumn("h", 0.0, 256.0, 32),
    DriftColumn("phash", -9.3e18, 9.3e18, 64),
)


def _part_histogram(df: DataFrame, spec: DriftColumn, cnt_alias: str) -> DataFrame:
    col = F.col(spec.column).cast("double")
    return (
        df.select("part", bucket_col(col, spec.lo, spec.hi, spec.nbins).alias("bucket"))
        .where(F.col("bucket").isNotNull())
        .groupBy("part", "bucket")
        .agg(F.count(F.lit(1)).alias(cnt_alias))
    )


def two_sample_drift(raw: DataFrame, curated: DataFrame, spec: DriftColumn) -> DataFrame:
    """→ one row per part: (part, ks_d, ks_threshold, psi, n, m)."""
    hr = _part_histogram(raw, spec, "cnt_r")
    hc = _part_histogram(curated, spec, "cnt_c")
    joined = (
        hr.join(hc, ["part", "bucket"], "full_outer")
        .select(
            "part",
            "bucket",
            F.coalesce("cnt_r", F.lit(0)).alias("cnt_r"),
            F.coalesce("cnt_c", F.lit(0)).alias("cnt_c"),
        )
    )
    by_part = Window.partitionBy("part")
    cum = by_part.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored = (
        joined.withColumn("n", F.sum("cnt_r").over(by_part))
        .withColumn("m", F.sum("cnt_c").over(by_part))
        .withColumn("ecdf_r", F.try_divide(F.sum("cnt_r").over(cum), F.col("n")))
        .withColumn("ecdf_c", F.try_divide(F.sum("cnt_c").over(cum), F.col("m")))
        .withColumn("p", (F.col("cnt_r") + PSI_EPS) / (F.col("n") + PSI_EPS * (spec.nbins + 2)))
        .withColumn("q", (F.col("cnt_c") + PSI_EPS) / (F.col("m") + PSI_EPS * (spec.nbins + 2)))
    )
    return scored.groupBy("part").agg(
        F.max(F.abs(F.col("ecdf_r") - F.col("ecdf_c"))).alias("ks_d"),
        (
            F.lit(KS_ALPHA_COEFF)
            * F.sqrt(F.try_divide(F.first("n") + F.first("m"), F.first("n") * F.first("m")))
        ).alias("ks_threshold"),
        F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))).alias("psi"),
        F.first("n").alias("n"),
        F.first("m").alias("m"),
    )


class DriftCheck(TableConstraint):
    """Emits two verdict families per column: drift_ks.<col>, drift_psi.<col>."""

    def __init__(self, specs: tuple[DriftColumn, ...] = DEFAULT_DRIFT_COLUMNS):
        self.specs = specs
        self.name = "drift"

    def run(self, ctx: SuiteContext) -> tuple[DataFrame, None]:
        verdict_frames = []
        for spec in self.specs:
            drift = two_sample_drift(ctx.raw, ctx.curated, spec)
            not_ready = (F.col("n") == 0) | (F.col("m") == 0) | F.col("ks_d").isNull()
            ks = drift.select(
                "part",
                F.lit(f"drift_ks.{spec.column}").alias("constraint"),
                F.when(not_ready, F.lit(NOT_READY))
                .when(F.col("ks_d") <= F.col("ks_threshold"), F.lit(PASS))
                .otherwise(F.lit(FAIL))
                .alias("verdict"),
                F.concat(F.lit("D="), F.round("ks_d", 6).cast("string")).alias("observed"),
                F.concat(F.lit("D<="), F.round("ks_threshold", 6).cast("string")).alias("expected"),
            )
            psi = drift.select(
                "part",
                F.lit(f"drift_psi.{spec.column}").alias("constraint"),
                F.when(not_ready, F.lit(NOT_READY))
                .when(F.col("psi") < PSI_FAIL, F.lit(PASS))
                .otherwise(F.lit(FAIL))
                .alias("verdict"),
                F.concat(F.lit("psi="), F.round("psi", 6).cast("string")).alias("observed"),
                F.lit(f"psi<{PSI_FAIL}").alias("expected"),
            )
            for frame, cname in ((ks, f"drift_ks.{spec.column}"), (psi, f"drift_psi.{spec.column}")):
                verdict_frames.append(
                    fill_pass_for_missing_parts(frame.drop("constraint"), ctx.parts, cname)
                )
        out = verdict_frames[0]
        for f_ in verdict_frames[1:]:
            out = out.unionByName(f_)
        return out, None
