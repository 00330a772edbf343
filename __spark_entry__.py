"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`bigdime_spark.contract`, which holds the paired
(Spark query, DuckDB oracle SQL) registry — one entry per implemented
operator family from SURVEY.md §2 plus the training-data-pipeline
operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdime_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ValidationSuite verdict table on sf0.001."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
