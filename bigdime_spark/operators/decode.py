"""Pixel-decode invariant checks (SURVEY B20; BASELINE.json:15).

The ONLY Python-side pass in the engine: ``mapInArrow`` over a
projection of (part, image_id, bytes, w, h, fmt, phash) — Arrow
batches, never per-row Python (BASELINE.json:15 "vectorized
pandas/Arrow UDFs (no per-row Python)").

Two reference modes:

- ``regen`` (seed given): the deterministic generator *is* the
  reference implementation — decoded pixels are compared against
  ``make_pixels(seed, image_id, w, h)``; PSNR ≥ 40 dB for lossy
  (rawq*), exact equality for lossless (raw/ppm/pngz).
- ``integrity`` (no seed): self-consistency — payload must decode at
  the declared (w, h, fmt) and the stored ``phash`` must equal the
  average-hash of the decoded pixels.

Undecodable payloads (corruption, unknown fmt, length mismatch) are
violations with the decoder's reason. Rows with NULL bytes/w/h/fmt
are skipped here — they belong to the not-null validators.

At 100 TB this pass is the dominant cost: the projection keeps every
other column's pages unread, `repartition(part)` co-locates partition
data, and Arrow batch size is capped (session.py) so a batch of
decoded images stays bounded in the Python worker.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdime_spark.operators.base import (
    SuiteContext,
    TableConstraint,
    violation_rows,
)
from bigdime_spark.schema import FAIL

PSNR_THRESHOLD_DB = 40.0

RESULT_SCHEMA = pa.schema(
    [
        pa.field("part", pa.string()),
        pa.field("image_id", pa.string()),
        pa.field("ok", pa.bool_()),
        pa.field("psnr", pa.float64()),
        pa.field("reason", pa.string()),
    ]
)
RESULT_DDL = "part string, image_id string, ok boolean, psnr double, reason string"


def _check_row(image_id, payload, w, h, fmt, stored_phash, seed):
    from bigdime_spark.sources import synth

    if payload is None or w is None or h is None or fmt is None:
        return None  # not this constraint's business
    try:
        pixels = synth.decode(payload, fmt, int(w), int(h))
    except Exception as exc:  # undecodable → violation
        return (False, None, f"decode_error: {exc}")
    lossy = fmt.startswith("rawq")
    if seed is not None:
        ref = synth.make_pixels(seed, image_id, int(w), int(h))
        p = synth.psnr(ref, pixels)
        if lossy:
            ok = p >= PSNR_THRESHOLD_DB
            return (ok, p, None if ok else f"psnr {p:.2f} dB < {PSNR_THRESHOLD_DB}")
        ok = math.isinf(p)
        return (ok, p, None if ok else "lossless pixels differ from reference")
    actual_phash = synth.phash64(pixels)
    ok = stored_phash is not None and int(stored_phash) == actual_phash
    return (ok, None, None if ok else f"phash {stored_phash} != recomputed {actual_phash}")


def decode_check(df: DataFrame, seed: int | None = None) -> DataFrame:
    """→ (part, image_id, ok, psnr, reason); one row per checked image."""

    def run_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            d = batch.to_pydict()
            parts, ids, oks, psnrs, reasons = [], [], [], [], []
            for part, image_id, payload, w, h, fmt, ph in zip(
                d["part"], d["image_id"], d["bytes"], d["w"], d["h"], d["fmt"], d["phash"]
            ):
                res = _check_row(image_id, payload, w, h, fmt, ph, seed)
                if res is None:
                    continue
                ok, p, reason = res
                parts.append(part)
                ids.append(image_id)
                oks.append(bool(ok))
                psnrs.append(None if p is None or math.isinf(p) else float(p))
                reasons.append(reason)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(parts, pa.string()),
                    pa.array(ids, pa.string()),
                    pa.array(oks, pa.bool_()),
                    pa.array(psnrs, pa.float64()),
                    pa.array(reasons, pa.string()),
                ],
                schema=RESULT_SCHEMA,
            )

    projected = df.select("part", "image_id", "bytes", "w", "h", "fmt", "phash")
    return projected.mapInArrow(run_batches, RESULT_DDL)


class DecodeIntegrity(TableConstraint):
    name = "decode"

    def __init__(self, seed: int | None = None, snapshot: str = "raw"):
        self.seed = seed
        self.snapshot = snapshot

    def run(self, ctx: SuiteContext) -> tuple[DataFrame, DataFrame]:
        df = ctx.raw if self.snapshot == "raw" else ctx.curated
        checked = decode_check(df, seed=self.seed)
        # persist only the FAILING rows (rare): the expensive Arrow
        # decode runs once even though verdicts and violations are
        # materialized by separate actions
        bad = checked.filter(~F.col("ok")).persist()
        ctx.extras.setdefault("persisted", []).append(bad)
        violations = violation_rows(
            bad, self.name, "bytes", F.coalesce("reason", F.lit("decode failed")), self.snapshot
        )
        failed_parts = (
            bad.groupBy("part")
            .agg(F.count(F.lit(1)).alias("bad_images"))
            .select(
                "part",
                F.lit(self.name).alias("constraint"),
                F.lit(FAIL).alias("verdict"),
                F.concat(F.lit("bad_images="), F.col("bad_images").cast("string")).alias("observed"),
                F.lit("bad_images=0").alias("expected"),
            )
        )
        # partial frame: suite grid join fills the PASS rows (pass 6)
        return failed_parts, violations

    @property
    def partial_verdicts(self) -> bool:
        return True

    def verdict_names(self) -> list[str]:
        return [self.name]
