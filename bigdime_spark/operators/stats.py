"""Per-column statistics profile (SURVEY B1–B11).

All stats for all columns fuse into the suite's ONE
``groupBy(part).agg(...)`` pass — one scan, one shuffle, partial+final
hash aggregation, whole-stage codegen (BASELINE.json:6 "per-column
stats (null-rate, min/max, distinct via HyperLogLog sketches) ... as
single-pass DataFrame aggregations").

Distinct counts are HLL sketches (``hll_sketch_agg``): the per-part
binary sketch is persisted so table-level or cross-snapshot distincts
are a cheap ``hll_union_agg`` roll-up instead of a rescan — the
mergeable-sketch requirement at 10^12-row scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class ColumnProfile:
    column: str
    numeric: bool = False
    stringlike: bool = False
    distinct: bool = False
    quantiles: tuple[float, ...] = ()
    #: most-frequent value (SURVEY B10 — hot-phash detection feed)
    mode: bool = False


@dataclass
class StatsProfile:
    """Declarative stats request; ``agg_exprs()`` feeds the fused pass."""

    columns: list[ColumnProfile] = field(default_factory=list)
    hll_lg_k: int = 12

    def agg_exprs(self) -> list[Column]:
        out: list[Column] = [F.count(F.lit(1)).alias("stat__rows")]
        for p in self.columns:
            c = F.col(p.column)
            n = p.column
            out.append(F.count_if(c.isNull()).alias(f"stat__{n}__nulls"))
            if p.numeric:
                out += [
                    F.min(c).alias(f"stat__{n}__min"),
                    F.max(c).alias(f"stat__{n}__max"),
                    F.avg(c).alias(f"stat__{n}__avg"),
                    F.stddev(c).alias(f"stat__{n}__stddev"),
                ]
            if p.stringlike:
                out += [
                    F.min(F.length(c)).alias(f"stat__{n}__min_len"),
                    F.max(F.length(c)).alias(f"stat__{n}__max_len"),
                ]
            if p.distinct:
                out += [
                    F.hll_sketch_agg(c, self.hll_lg_k).alias(f"stat__{n}__hll"),
                ]
            if p.quantiles:
                out.append(
                    F.percentile_approx(c, list(p.quantiles)).alias(f"stat__{n}__quantiles")
                )
            if p.mode:
                out.append(F.mode(c).alias(f"stat__{n}__mode"))
        return out

    @staticmethod
    def finalize_exprs(agg_columns: list[str]) -> list[Column]:
        """Post-agg projections: HLL sketch → scalar estimate (the binary
        sketch column is kept alongside for mergeable roll-ups)."""
        out: list[Column] = []
        for name in agg_columns:
            if name.endswith("__hll"):
                out.append(
                    F.hll_sketch_estimate(F.col(name)).alias(name.replace("__hll", "__distinct"))
                )
        return out


def default_image_stats() -> StatsProfile:
    """Stats over the BASELINE.json:15 schema — non-binary columns only
    (the stats scan must never read `bytes` pages — SURVEY B0b)."""
    return StatsProfile(
        columns=[
            ColumnProfile("image_id", stringlike=True, distinct=True),
            ColumnProfile("w", numeric=True, quantiles=(0.25, 0.5, 0.75)),
            ColumnProfile("h", numeric=True, quantiles=(0.25, 0.5, 0.75)),
            ColumnProfile("fmt", stringlike=True, distinct=True),
            ColumnProfile("caption", stringlike=True),
            ColumnProfile("phash", numeric=False, distinct=True, mode=True),
        ]
    )
