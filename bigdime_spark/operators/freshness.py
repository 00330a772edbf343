"""Freshness / staleness validator (SURVEY §2.B family, reference
analogue: the ingestion-lag monitoring the reference's pipeline
emits through its metrics handler [public knowledge — source mount
empty, §0]; the deequ-style ``maxLag`` analyzer re-expressed as a
fused per-partition aggregation).

A partition whose newest row is older than ``max_lag_seconds``
relative to an EXPLICIT reference instant ``as_of`` FAILs — a stalled
upstream producer looks exactly like this (counts still match, the
checksum still matches, but nothing new arrived). ``as_of`` is always
caller-supplied, never ``now()``: verdicts must be deterministic
under retry/resume (the lineage-resume contract re-runs a killed
part and must reach the identical verdict), and the oracle replays
the same literal.

Scale shape: one ``max(ts)`` agg column fused into the suite's single
stats pass (zero extra scans at any data size), or the standalone
``freshness_profile`` — one scan, one parts-sized hash agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import AggConstraint
from bigdime_spark.schema import FAIL, NOT_READY, PASS


def _cutoff_epoch(as_of: str, max_lag_seconds: int) -> Column:
    return F.unix_timestamp(F.to_timestamp(F.lit(as_of))) - F.lit(
        int(max_lag_seconds)
    )


def freshness_profile(
    df: DataFrame,
    ts_col: str,
    *,
    by: str = "part",
    as_of: str,
    max_lag_seconds: int,
) -> DataFrame:
    """Per-group staleness report → (by, max_ts [second precision],
    lag_seconds, verdict). ``lag_seconds`` = floor-epoch distance from
    the group's newest row to ``as_of`` (an ISO ``YYYY-MM-DD HH:MM:SS``
    literal, session-timezone/UTC); verdict FAILs when the lag exceeds
    ``max_lag_seconds``, NOT_READY when the group has no non-null
    timestamp at all (an all-null ts column is a producer bug, not
    fresh data)."""
    as_of_epoch = F.unix_timestamp(F.to_timestamp(F.lit(as_of)))
    mx = F.max(ts_col)
    agg = df.groupBy(by).agg(mx.alias("_max_ts"))
    lag = as_of_epoch - F.unix_timestamp(F.col("_max_ts"))
    return agg.select(
        by,
        F.date_format("_max_ts", "yyyy-MM-dd HH:mm:ss").alias("max_ts"),
        lag.alias("lag_seconds"),
        F.when(F.col("_max_ts").isNull(), F.lit(NOT_READY))
        .when(lag <= F.lit(int(max_lag_seconds)), F.lit(PASS))
        .otherwise(F.lit(FAIL))
        .alias("verdict"),
    )


class Freshness(AggConstraint):
    """Fusable per-partition freshness constraint: ``max(ts_col)``
    rides the suite's single stats aggregation; the verdict compares
    its floor-epoch against ``as_of - max_lag_seconds``."""

    def __init__(self, ts_col: str, *, as_of: str, max_lag_seconds: int):
        self.ts_col = ts_col
        self.as_of = as_of
        self.max_lag_seconds = int(max_lag_seconds)
        self.name = f"freshness.{ts_col}"
        self._agg = f"fr__{ts_col}__max"

    def agg_exprs(self) -> list[Column]:
        return [F.max(self.ts_col).alias(self._agg)]

    def verdict_col(self) -> Column:
        cutoff = _cutoff_epoch(self.as_of, self.max_lag_seconds)
        return (
            F.when(F.col(self._agg).isNull(), F.lit(NOT_READY))
            .when(F.unix_timestamp(F.col(self._agg)) >= cutoff, F.lit(PASS))
            .otherwise(F.lit(FAIL))
        )

    def observed_col(self) -> Column:
        return F.date_format(F.col(self._agg), "yyyy-MM-dd HH:mm:ss")

    def expected_col(self) -> Column:
        return F.concat(
            F.lit(f"within {self.max_lag_seconds}s of "), F.lit(self.as_of)
        )
