"""Caption byte-equality raw vs curated (SURVEY B21; BASELINE.json:15).

Inner join on image_id; a mismatch is ``NOT (raw.caption <=>
curated.caption)`` — Spark string comparison is exact UTF-8
byte-equality, and the null-safe operator keeps (null, null) pairs
out of this constraint (nulls belong to not_null). JVM-side, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import (
    SuiteContext,
    TableConstraint,
    fill_pass_for_missing_parts,
    violation_rows,
)
from bigdime_spark.schema import FAIL


class CaptionEquality(TableConstraint):
    name = "caption_equality"

    def __init__(self, key: str = "image_id", column: str = "caption"):
        self.key = key
        self.column = column

    def run(self, ctx: SuiteContext) -> tuple[DataFrame, DataFrame]:
        raw = ctx.raw.select(self.key, "part", F.col(self.column).alias("_raw_val"))
        cur = ctx.curated.select(self.key, F.col(self.column).alias("_cur_val"))
        mism = raw.join(cur, self.key).filter(~F.col("_raw_val").eqNullSafe(F.col("_cur_val")))
        violations = violation_rows(
            mism,
            self.name,
            self.column,
            F.concat_ws(
                " != ",
                F.coalesce(F.col("_raw_val"), F.lit("∅")),
                F.coalesce(F.col("_cur_val"), F.lit("∅")),
            ),
            "curated",
            image_id_col=self.key,
        )
        failed_parts = (
            mism.groupBy("part")
            .agg(F.count(F.lit(1)).alias("mismatches"))
            .select(
                "part",
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("mismatches="), F.col("mismatches").cast("string")).alias("observed"),
                F.lit("mismatches=0").alias("expected"),
            )
        )
        return fill_pass_for_missing_parts(failed_parts, ctx.parts, self.name), violations
