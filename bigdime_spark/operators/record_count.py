"""RecordCountValidator (SURVEY B12, reference analogue A9).

Reference semantics [public knowledge + BASELINE.json:6]: compare the
source-stamped record count (event header) against the count of rows
actually landed; a missing header/config → INCOMPLETE_SETUP, not a
data failure. Here: fused per-partition count vs broadcast-joined
manifest ``expected_rows``; partition absent from manifest →
``SKIPPED_CONFIG``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bigdime_spark.operators.base import AggConstraint
from bigdime_spark.schema import FAIL, PASS, SKIPPED_CONFIG

ROWS_AGG = "rc__rows"  # shared row-count agg column (also feeds lineage metrics)


class RecordCount(AggConstraint):
    name = "record_count"

    def agg_exprs(self) -> list[Column]:
        return [F.count(F.lit(1)).alias(ROWS_AGG)]

    def needs_manifest(self) -> bool:
        return True

    def verdict_col(self) -> Column:
        return (
            F.when(F.col("expected_rows").isNull(), F.lit(SKIPPED_CONFIG))
            .when(F.col(ROWS_AGG) == F.col("expected_rows"), F.lit(PASS))
            .otherwise(F.lit(FAIL))
        )

    def observed_col(self) -> Column:
        return F.col(ROWS_AGG).cast("string")

    def expected_col(self) -> Column:
        return F.col("expected_rows").cast("string")
