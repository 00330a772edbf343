"""Per-bit balance of an int64 fingerprint column — the phash
degeneracy detector (image-payload validation, SURVEY §2.B B9/B22
family).

Reference parity: ``/root/reference`` is empty (SURVEY §0); the check
is the standard hash-health diagnostic: a healthy perceptual hash
sets each of its 64 bits on roughly half the corpus. A bit whose
set-fraction collapses toward 0 or 1 is STUCK — a broken upstream
phash kernel (all-black thumbnails, a truncated integer cast, an
endianness bug) that per-row range checks cannot see because every
individual value still looks plausible. Stuck bits also silently
degrade every downstream hamming-distance dedup (C4/C4b): a 64-bit
hash with 20 stuck bits is a 44-bit hash.

Design for 10^12 rows: ONE aggregation — n_bits ``sum((x >> i) & 1)``
columns plus a count, all JVM-side codegen; per-part rows melt to
(part, bit) AFTER the agg, so the exchange carries parts × 1 rows of
n_bits integers, never row-level data. As an ``AggConstraint`` the
sums fuse into the suite's single stats pass: the detector is free —
no extra scan, no extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import AggConstraint
from bigdime_spark.schema import FAIL, PASS, SKIPPED_CONFIG

_PREFIX = "bb__"


def _bit_sum_exprs(col: str, n_bits: int) -> list[Column]:
    # shiftright is an ARITHMETIC shift in both Spark and the DuckDB
    # oracle, so (x >> 63) & 1 reads the sign bit identically.
    return [
        F.sum(F.shiftright(F.col(col), i).bitwiseAND(F.lit(1))).alias(
            f"{_PREFIX}{i}"
        )
        for i in range(n_bits)
    ]


def bit_balance(
    df: DataFrame,
    col: str,
    part_col: str | None = "part",
    n_bits: int = 64,
) -> DataFrame:
    """Per-bit set fractions → (part?, bit, n_rows, n_set, frac).

    One fused aggregation (count + n_bits sums), melted to long rows
    with ``stack`` only after the per-part reduction. NULL values are
    excluded from both n_rows and the sums (a hash that is absent is
    the not-null validator's finding, not a balance signal).
    """
    if not 1 <= n_bits <= 64:
        raise ValueError(f"n_bits={n_bits} must be in [1, 64]")
    keys = [part_col] if part_col else []
    agg = df.groupBy(*keys).agg(
        F.count(col).alias("n_rows"), *_bit_sum_exprs(col, n_bits)
    )
    stack = ", ".join(f"{i}, {_PREFIX}{i}" for i in range(n_bits))
    out = agg.select(
        *keys,
        "n_rows",
        F.expr(f"stack({n_bits}, {stack}) AS (bit, n_set)"),
    )
    return out.select(
        *keys,
        "bit",
        "n_rows",
        F.coalesce("n_set", F.lit(0)).alias("n_set"),
        F.when(F.col("n_rows") == 0, F.lit(None))
        .otherwise(
            F.round(F.coalesce("n_set", F.lit(0)) / F.col("n_rows"), 6)
        )
        .alias("frac"),
    )


def degenerate_bits(
    df: DataFrame,
    col: str,
    part_col: str | None = "part",
    n_bits: int = 64,
    lo: float = 0.02,
    hi: float = 0.98,
) -> DataFrame:
    """The stuck bits only: balance rows with frac outside [lo, hi]."""
    bb = bit_balance(df, col, part_col, n_bits)
    return bb.filter((F.col("frac") < lo) | (F.col("frac") > hi))


class BitBalance(AggConstraint):
    """Suite form: FAIL a partition when any bit of ``col`` is stuck.

    Rides the fused stats aggregation (zero extra scans/shuffles);
    the verdict row carries the stuck-bit count and the extreme
    fractions so the report reads "12 bits stuck, worst 0.0" without
    a second pass. An all-NULL partition is SKIPPED_CONFIG (there is
    nothing to balance), mirroring RecordCount's missing-manifest
    disposition.
    """

    def __init__(
        self,
        col: str = "phash",
        n_bits: int = 64,
        lo: float = 0.02,
        hi: float = 0.98,
    ):
        if not 0.0 <= lo < hi <= 1.0:
            raise ValueError(f"bounds [{lo}, {hi}] must satisfy 0 <= lo < hi <= 1")
        self.col, self.n_bits, self.lo, self.hi = col, n_bits, lo, hi
        self.name = f"bit_balance_{col}"

    def agg_exprs(self) -> list[Column]:
        return [
            F.count(self.col).alias(f"{_PREFIX}n"),
            *_bit_sum_exprs(self.col, self.n_bits),
        ]

    def _fracs(self) -> list[Column]:
        n = F.col(f"{_PREFIX}n")
        return [F.col(f"{_PREFIX}{i}") / n for i in range(self.n_bits)]

    def _stuck_count(self) -> Column:
        cnt = F.lit(0)
        for fr in self._fracs():
            cnt = cnt + F.when((fr < self.lo) | (fr > self.hi), 1).otherwise(0)
        return cnt

    def verdict_col(self) -> Column:
        return (
            F.when(F.col(f"{_PREFIX}n") == 0, F.lit(SKIPPED_CONFIG))
            .when(self._stuck_count() == 0, F.lit(PASS))
            .otherwise(F.lit(FAIL))
        )

    def observed_col(self) -> Column:
        fracs = F.array(*self._fracs())
        return F.concat(
            F.lit("stuck_bits="),
            self._stuck_count().cast("string"),
            F.lit(";min_frac="),
            F.round(F.array_min(fracs), 4).cast("string"),
            F.lit(";max_frac="),
            F.round(F.array_max(fracs), 4).cast("string"),
        )

    def expected_col(self) -> Column:
        return F.lit(
            f"all {self.n_bits} bit fracs in [{self.lo}, {self.hi}]"
        )
