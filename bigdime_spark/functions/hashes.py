"""Hashing/checksum column builders (SURVEY B13).

The reference's RawChecksumValidator compares a source-file checksum
against the landed HDFS file's checksum (WebHDFS GETFILECHECKSUM)
[public knowledge, source unavailable — SURVEY §0]. Spark scan order
is nondeterministic, so the engine's content checksum must be
*order-insensitive*: per-row ``xxhash64`` combined with two
commutative reducers — XOR and SUM — together (XOR alone cancels on
duplicated pairs; SUM alone misses permuted bit patterns; a forged
collision must fool both).

SUM accumulates in decimal(38,0): 10^12 rows × |int64| < 10^31 keeps
the exact sum in range (no ANSI overflow at target scale).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: full-content columns covered by the checksum (everything incl. bytes)
CHECKSUM_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

#: unsigned-64 mask for python-side xor folds (python ints are
#: unbounded, Spark longs wrap) — shared by the decode ride partials
#: and the streaming state so their wrap semantics can never diverge
U64_MASK = (1 << 64) - 1


def to_signed64(v: int) -> int:
    """Re-wrap a python int into two's-complement int64."""
    v &= U64_MASK
    return v - (1 << 64) if v >= (1 << 63) else v


def row_checksum_col(columns: list[str] | None = None) -> Column:
    """Per-row 64-bit content digest (JVM-side, codegen'd)."""
    return F.xxhash64(*(columns or CHECKSUM_COLUMNS))


def checksum_agg_exprs(hash_col: str = "_h") -> list[Column]:
    """Commutative per-partition reducers over the row digest."""
    return [
        F.bit_xor(hash_col).alias("actual_xor"),
        F.sum(F.col(hash_col).cast("decimal(38,0)")).alias("actual_sum"),
    ]
