"""Payload structural conformance (SURVEY B31): does the binary image
payload STRUCTURALLY match its declared format and dimensions — at
parquet-scan speed, entirely JVM-side?

The decode pass (B20) proves payloads decode; it pays the Arrow
boundary and per-image Python work. This validator is its cheap
precursor for decode-off runs: pure Column expressions over
``length(bytes)`` and the first payload bytes catch the overwhelmingly
common corruption classes — truncated / padded payloads, header/
dimension mismatches, a producer stamping the wrong ``fmt`` — inside
whole-stage codegen, with zero Python. The 10^12-row posture: run
conformance every night fused into the checksum's full-payload scan
(zero extra scans — see plans/suite.py pass 3), run the full decode
weekly. A suite that already runs DecodeIntegrity gets strictly
stronger checks from it; this constraint exists for the runs that
don't.

Format rules mirror sources/synth.py's codec contract (the container
formats this engine's fixtures use):

- ``raw`` / ``rawq<k>`` — exactly ``3·w·h`` bytes, no container.
- ``ppm``  — binary P6: ``b"P6\\n{w} {h}\\n255\\n"`` header then
  ``3·w·h`` pixel bytes; prefix AND total length must both match.
- ``pngz`` — zlib stream: first byte 0x78 (deflate/32K window),
  second byte one of the four standard FLEVEL check bytes. The
  decompressed-length invariant is decode's business — a structural
  scan can only validate the container envelope.
- any other fmt value — nonconforming ("unknown fmt"): a payload
  whose declared format the engine cannot even classify must surface
  here, not silently pass.

NULL handling: a row with NULL bytes / fmt / dimensions is NOT a
conformance violation (NotNull owns nulls) — the predicate treats it
as conforming, so the two verdict families stay disjoint.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import AggConstraint, violation_rows
from bigdime_spark.schema import FAIL, PASS

#: second zlib byte for CM=8/CINFO=7: the four standard FCHECK values
_ZLIB_SECOND = (0x01, 0x5E, 0x9C, 0xDA)


def _ppm_header(w: Column, h: Column) -> Column:
    return F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"), F.lit("\n255\n")
    )


def payload_mismatch_col(
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
) -> Column:
    """NULL when the payload structurally conforms (or any input is
    NULL — nulls are NotNull's business); otherwise a short reason
    string. Pure Column expressions — whole-stage codegen, no UDF."""
    b, w, h, fmt = (F.col(c) for c in (bytes_col, w_col, h_col, fmt_col))
    # try_-multiply: corrupted dimensions (the very corruption class
    # this validator flags) must not ANSI-overflow the run — a NULL
    # expected length reads as "cannot possibly match" below, since no
    # real payload has a length beyond int64
    n = F.try_multiply(
        F.try_multiply(w.cast("long"), h.cast("long")), F.lit(3).cast("long")
    )
    blen = F.length(b).cast("long")
    header = _ppm_header(w, h)
    first = F.expr(f"substring({bytes_col}, 1, 1)")
    second = F.expr(f"substring({bytes_col}, 2, 1)")
    zlib_ok = (first == F.lit(bytes([0x78]))) & second.isin(
        [bytes([v]) for v in _ZLIB_SECOND]
    )
    inputs_null = b.isNull() | w.isNull() | h.isNull() | fmt.isNull()
    len_bad = n.isNull() | (blen != n)
    reason = (
        F.when(
            (fmt == "raw") | fmt.startswith("rawq"),
            F.when(len_bad, F.lit("payload length mismatch")),
        )
        .when(
            fmt == "ppm",
            F.when(
                ~b.startswith(F.encode(header, "UTF-8"))
                | n.isNull()
                | (blen != F.length(header).cast("long") + n),
                F.lit("bad ppm header or length"),
            ),
        )
        .when(fmt == "pngz", F.when(~zlib_ok, F.lit("bad zlib magic")))
        .otherwise(F.lit("unknown fmt"))
    )
    return F.when(inputs_null, F.lit(None).cast("string")).otherwise(reason)


def payload_conformance_profile(
    df: DataFrame,
    bytes_col: str = "bytes",
    w_col: str = "w",
    h_col: str = "h",
    fmt_col: str = "fmt",
    part_col: str | None = "part",
) -> DataFrame:
    """Per-partition conformance counts with a per-reason breakdown:
    (part?, reason, n_rows) where reason NULL rows are the conforming
    mass — one scan, one tiny hash-agg (group count ≤ parts × 5)."""
    reason = payload_mismatch_col(bytes_col, w_col, h_col, fmt_col)
    keys = ([part_col] if part_col else []) + ["reason"]
    return (
        df.select(
            *([part_col] if part_col else []), reason.alias("reason")
        )
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


class PayloadConformance(AggConstraint):
    """Fusable structural-conformance constraint. Marked
    ``reads_payload`` so the suite keeps it OUT of the bytes-free
    stats aggregation (B0b): it fuses into the checksum's
    full-payload scan when one runs, and gets its own column-pruned
    scan otherwise (plans/suite.py pass 3)."""

    name = "payload_conformance"
    reads_payload = True

    def __init__(
        self,
        bytes_col: str = "bytes",
        w_col: str = "w",
        h_col: str = "h",
        fmt_col: str = "fmt",
    ):
        self.bytes_col = bytes_col
        self.w_col, self.h_col, self.fmt_col = w_col, h_col, fmt_col
        self._agg = "pc__bad"
        self._reason = payload_mismatch_col(bytes_col, w_col, h_col, fmt_col)

    def agg_exprs(self) -> list[Column]:
        return [F.count_if(self._reason.isNotNull()).alias(self._agg)]

    def verdict_col(self) -> Column:
        return F.when(F.col(self._agg) == 0, F.lit(PASS)).otherwise(F.lit(FAIL))

    def observed_col(self) -> Column:
        return F.concat(F.lit("nonconforming="), F.col(self._agg).cast("string"))

    def expected_col(self) -> Column:
        return F.lit("nonconforming=0")

    def violations(self, df: DataFrame, snapshot: str) -> DataFrame:
        return violation_rows(
            df.filter(self._reason.isNotNull()),
            self.name,
            self.bytes_col,
            self._reason,
            snapshot,
        )

    def violation_spec(self):
        # NOTE: this predicate reads payload bytes — the suite's
        # rescan gate drops it unless THIS constraint's own fused
        # counter is non-zero, so a clean conformance pass never pays
        # a second payload read (even when other constraints are
        # dirty).
        return (self._reason.isNotNull(), self.bytes_col, self._reason)

    def violation_count_col(self):
        return self._agg
