"""Per-partition lineage + checkpoint/resume (SURVEY B26, B0c).

Reference analogue: ``RuntimeInfoStore`` rows, one per input unit,
lifecycle QUEUED → STARTED → VALIDATED/FAILED; restart skips units
already VALIDATED [public knowledge; BASELINE.json:14 "resumable from
checkpoint ... no re-validated partitions"].

Here the store is an append-only parquet/Iceberg table keyed by
``part``. Re-runs are idempotent: the *latest* status per part wins
(window row_number over run order). The resume scan filters the
input with ``~part.isin(done)`` — an IN-filter on the partition
column, which both parquet and Iceberg turn into partition pruning
(no data files of validated partitions are opened at all).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdime_spark.schema import LINEAGE_SCHEMA

VALIDATED = "VALIDATED"
FAILED = "FAILED"


class LineageStore:
    def __init__(self, path: str):
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self, spark: SparkSession) -> DataFrame:
        if not os.path.isdir(self.path):
            return spark.createDataFrame([], LINEAGE_SCHEMA)
        try:
            return spark.read.parquet(self.path)
        except Exception:
            return spark.createDataFrame([], LINEAGE_SCHEMA)

    def append(self, lineage: DataFrame) -> None:
        (
            lineage.withColumn("_ingested_ms", F.lit(int(time.time() * 1000)))
            .write.mode("append")
            .parquet(self.path)
        )

    def validated_parts(self, spark: SparkSession) -> DataFrame:
        """Parts whose LATEST recorded status is VALIDATED → skip list."""
        lin = self.read(spark)
        if "_ingested_ms" not in lin.columns:
            lin = lin.withColumn("_ingested_ms", F.lit(0))
        latest = Window.partitionBy("part").orderBy(
            F.desc("_ingested_ms"), F.desc("run_id")
        )
        return (
            lin.withColumn("_rn", F.row_number().over(latest))
            .filter((F.col("_rn") == 1) & (F.col("status") == VALIDATED))
            .select("part")
        )


def apply_resume_filter(df: DataFrame, done_parts: list[str]) -> DataFrame:
    """IN-list filter on the partition column → partition pruning.

    The done-list is collected to the driver deliberately: it is one
    string per partition (bounded — partitions, not rows), and a
    literal IN filter is the form Catalyst/Iceberg prune on. The
    anti-join alternative (B0c) would shuffle the full input."""
    if not done_parts:
        return df
    return df.filter(~F.col("part").isin(done_parts))
