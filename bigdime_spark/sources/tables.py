"""Table-IO seam: Iceberg when available, partitioned parquet otherwise.

The north rule targets Iceberg tables (BASELINE.json:14), but this
sandbox has no Iceberg runtime jar and no network (SURVEY.md §1.2),
so every reader/writer goes through this seam: ``format="iceberg"``
+ snapshot reads when the catalog is configured, identical-semantics
partitioned parquet directories otherwise. All validator logic sits
above the seam and is format-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdime_spark.schema import PART_COL


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        jvm = spark._jvm  # noqa: SLF001
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_table(
    spark: SparkSession,
    ref: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read a table snapshot.

    ``ref`` is an Iceberg table identifier (contains no '/') or a
    parquet directory path. Snapshot pinning maps to Iceberg's
    ``snapshot-id`` read option; the parquet fallback is
    directory-per-snapshot, so ``ref`` already names the snapshot.
    """
    if "/" not in ref and _iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(ref)
    return spark.read.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: str | None = PART_COL,
) -> None:
    """Write a snapshot. Iceberg ``writeTo(...).append()`` when the jar
    is present; partitioned parquet otherwise (identical partition
    semantics: one directory per ``part`` value → partition pruning)."""
    spark = df.sparkSession
    if "/" not in ref and _iceberg_available(spark):
        if mode == "append":
            df.writeTo(ref).append()
        else:
            df.writeTo(ref).createOrReplace()
        return
    if partition_by and partition_by in df.columns:
        # co-locate each partition's rows before the write: without
        # this, every write task emits one file into EVERY partition
        # directory (tasks × partitions tiny files), and each later
        # scan pays per-file open/footer costs that dwarf the data —
        # the small-files problem, fatal at both bench and 100 TB scale.
        df = df.repartition(partition_by)
        df.write.mode(mode).partitionBy(partition_by).parquet(ref)
        return
    df.write.mode(mode).parquet(ref)
