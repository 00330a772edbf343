"""RawChecksumValidator (SURVEY B13, reference analogue A10).

Reference semantics [public knowledge + BASELINE.json:6]: the source
handler stamps a file checksum in event headers; after landing, the
validator fetches the written file's checksum and compares — mismatch
→ FAILED (+ quarantine). Spark reads rows in nondeterministic order,
so the engine's equivalent is an order-insensitive *content* checksum
per partition: xxhash64 per row, reduced with commutative XOR and
exact decimal SUM (both must match — see functions/hashes.py).
Partition missing from the manifest → SKIPPED_CONFIG.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bigdime_spark.functions.hashes import checksum_agg_exprs, row_checksum_col
from bigdime_spark.operators.base import AggConstraint
from bigdime_spark.schema import FAIL, PASS, SKIPPED_CONFIG

HASH_COL = "_rowhash"


class Checksum(AggConstraint):
    name = "checksum"

    def __init__(self, columns: list[str] | None = None):
        self.columns = columns

    def pre_columns(self) -> dict[str, Column]:
        return {HASH_COL: row_checksum_col(self.columns)}

    def agg_exprs(self) -> list[Column]:
        return checksum_agg_exprs(HASH_COL)

    def needs_manifest(self) -> bool:
        return True

    def verdict_col(self) -> Column:
        return (
            F.when(F.col("expected_xor").isNull(), F.lit(SKIPPED_CONFIG))
            .when(
                (F.col("actual_xor") == F.col("expected_xor"))
                & (F.col("actual_sum") == F.col("expected_sum")),
                F.lit(PASS),
            )
            .otherwise(F.lit(FAIL))
        )

    def observed_col(self) -> Column:
        return F.concat_ws(
            "/", F.col("actual_xor").cast("string"), F.col("actual_sum").cast("string")
        )

    def expected_col(self) -> Column:
        return F.concat_ws(
            "/", F.col("expected_xor").cast("string"), F.col("expected_sum").cast("string")
        )
