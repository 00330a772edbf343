"""Image-SPACE drift riding the decode pass (operators/decode:
pixel_bins / pixel_stats_frame / pixel_drift, suite decode_pixel_drift).

The check byte-level validators cannot express: a curated re-encode
that shifts the pixel-value distribution and honestly RE-STAMPS phash
passes decode integrity, checksum (its own manifest) and caption
equality — only the pooled channel-value histogram moves. No SQL
oracle is possible (the histogram exists only behind the Python
decoder), so correctness is pinned the B20/C15 way: a numpy reference
fold, batch-split invariance, a zero-drift identity, and the planted
re-encode e2e.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.decode import (
    DecodeIntegrity,
    decode_check_multi,
    pixel_drift,
    pixel_stats_frame,
)
from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
from bigdime_spark.sources import synth
from bigdime_spark.sources.synth import build_fixture, generate_images

BINS = 32


def _numpy_part_hists(rows, bins=BINS):
    """Reference fold: pooled channel-value histogram of the DECODED
    payload per part, in the (bins+2)-long width_bucket layout."""
    out: dict[str, np.ndarray] = {}
    for r in rows:
        pixels = synth.decode(bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
        acc = out.setdefault(r["part"], np.zeros(256, dtype=np.int64))
        acc += np.bincount(pixels.reshape(-1), minlength=256)
    return {
        p: [0, *(int(v) for v in c.reshape(bins, -1).sum(axis=1)), 0]
        for p, c in out.items()
    }


def _frame_hists(checked, snapshot, bins=BINS):
    return {
        r["part"]: list(r["stat__pixels__hist"])
        for r in pixel_stats_frame(checked, snapshot, bins).collect()
    }


def test_pixel_hist_matches_numpy_reference(spark):
    fx = build_fixture(spark, n_rows=48, n_parts=2)
    checked = decode_check_multi({"raw": fx.raw}, pixel_bins=BINS)
    got = _frame_hists(checked, "raw")
    want = _numpy_part_hists(fx.raw.collect())
    assert got == want
    # sentinels are structural zeros for uint8 pixels
    for arr in got.values():
        assert arr[0] == 0 and arr[-1] == 0 and len(arr) == BINS + 2


def test_batch_split_invariance(spark):
    """The per-part aggregate is identical at any Arrow batch size:
    per-batch partials are partial SUMS, and sums compose."""
    fx = build_fixture(spark, n_rows=48, n_parts=2)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "7")
        small = _frame_hists(decode_check_multi({"raw": fx.raw}, pixel_bins=BINS), "raw")
        spark.conf.set(key, "10000")
        big = _frame_hists(decode_check_multi({"raw": fx.raw}, pixel_bins=BINS), "raw")
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert small == big


def test_identical_snapshots_score_zero(spark):
    fx = build_fixture(spark, n_rows=48, n_parts=2)
    checked = decode_check_multi(
        {"raw": fx.raw, "curated": fx.raw}, pixel_bins=BINS
    )
    rows = pixel_drift(checked, BINS).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["column"] == "pixels"
        assert r["ks_d"] == 0.0
        assert abs(r["psi"]) < 1e-12
        assert r["n"] == r["m"] > 0


def _requantized_copy(spark, raw):
    """The adversarial curated snapshot: every payload re-encoded from
    3-bit-quantized pixels with phash honestly RE-STAMPED — decode
    integrity, not-null, uniqueness and caption equality all pass."""
    rows = []
    for r in raw.collect():
        pixels = synth.decode(bytes(r["bytes"]), r["fmt"], r["w"], r["h"])
        q = synth.quantize(pixels, 3)
        rows.append(
            (
                r["image_id"],
                q.tobytes() if r["fmt"] == "raw" else synth.encode(q, r["fmt"]),
                r["w"], r["h"], r["fmt"], r["caption"],
                synth.phash64(q), r["part"],
            )
        )
    return spark.createDataFrame(rows, raw.schema)


def test_requantized_curated_flagged_only_by_pixel_drift(spark):
    """The headline: a quantizing re-encode with re-stamped phash is
    invisible to decode integrity and caption equality but FAILs
    drift_ks.pixels / drift_psi.pixels in every part."""
    raw = generate_images(spark, 32, n_parts=2, fmts=("raw", "pngz"))
    curated = _requantized_copy(spark, raw)
    res = ValidationSuite(
        not_null=("image_id",),
        check_record_count=False,
        check_checksum=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        check_decode=True,
        decode_pixel_drift=True,
        decode_pixel_bins=BINS,
    ).run(spark, raw, curated, run_id="pixdrift")
    v = {(r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()}
    res.release()
    for p in ("p0000", "p0001"):
        # the re-encode itself is self-consistent → integrity passes
        assert v[(p, "decode")] == "PASS"
        assert v[(p, "decode.curated")] == "PASS"
        assert v[(p, "caption_equality")] == "PASS"
        # uniform → 8-spike pixel distribution: both families flag it
        assert v[(p, "drift_ks.pixels")] == "FAIL"
        assert v[(p, "drift_psi.pixels")] == "FAIL"


def test_clean_pair_passes_pixel_drift(spark):
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    res = ValidationSuite(
        not_null=("image_id",),
        check_record_count=False,
        check_checksum=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        check_decode=True,
        decode_seed=42,
        decode_pixel_drift=True,
    ).run(spark, fx.raw, fx.curated, run_id="pixclean")
    v = {(r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()}
    res.release()
    for p in ("p0000", "p0001"):
        assert v[(p, "drift_ks.pixels")] == "PASS"
        assert v[(p, "drift_psi.pixels")] == "PASS"


def test_rejections(spark):
    with pytest.raises(ValueError, match="curated"):
        DecodeIntegrity(pixel_drift=True, snapshots=("raw",))
    with pytest.raises(ValueError, match="divisor of 256"):
        DecodeIntegrity(
            pixel_drift=True, pixel_bins=17, snapshots=("raw", "curated")
        )
    with pytest.raises(ValueError, match="divisor of 256"):
        decode_check_multi({"raw": None}, pixel_bins=-4)
    # suite-level gate: histograms cannot ride a pass that is off
    with pytest.raises(ValueError, match="check_decode"):
        ValidationSuite(
            check_decode=False, decode_pixel_drift=True
        ).run(spark, generate_images(spark, 4, n_parts=1))
    # run-time gate: both snapshots requested but no curated supplied
    fx = build_fixture(spark, n_rows=8, n_parts=1)
    with pytest.raises(ValueError, match="curated"):
        ValidationSuite(
            not_null=(),
            check_record_count=False,
            check_checksum=False,
            check_uniqueness=False,
            check_referential=False,
            check_caption=False,
            check_drift=False,
            check_domains=False,
            stats=StatsProfile(columns=[]),
            check_decode=True,
            decode_pixel_drift=True,
        ).run(spark, fx.raw, run_id="pixgate")


def test_config_rejections():
    from bigdime_spark.plans.config import suite_from_config

    with pytest.raises(ValueError, match="decode_pixel_drift"):
        suite_from_config({"decode_pixel_drift": True})
    with pytest.raises(ValueError, match="decode_pixel_bins"):
        suite_from_config(
            {"check_decode": True, "decode_pixel_drift": True, "decode_pixel_bins": 17}
        )
    s = suite_from_config(
        {"check_decode": True, "decode_pixel_drift": True, "decode_pixel_bins": 64}
    )
    assert s.decode_pixel_drift is True and s.decode_pixel_bins == 64


def test_pixel_hist_persists_into_stats_for_cross_run_drift(spark):
    """The raw snapshot's pixel histograms land in the suite's stats
    frame (stat__pixels__hist), so drift_from_stats over two RUNS'
    persisted stats scores image-space drift run-over-run — zero
    rescan, zero re-decode (the `drift` CLI path)."""
    from bigdime_spark.operators.drift import drift_from_stats

    raw = generate_images(spark, 32, n_parts=2, fmts=("raw", "pngz"))
    shifted = _requantized_copy(spark, raw)

    def run(df, rid):
        return ValidationSuite(
            not_null=("image_id",),
            check_record_count=False,
            check_checksum=False,
            check_drift=False,
            check_domains=False,
            stats=StatsProfile(columns=[]),
            check_decode=True,
            decode_pixel_drift=True,
            decode_pixel_bins=BINS,
        ).run(spark, df, df, run_id=rid)

    r1, r2 = run(raw, "x1"), run(shifted, "x2")
    assert "stat__pixels__hist" in r1.stats.columns
    same = {r["part"]: r for r in drift_from_stats(r1.stats, r1.stats).collect()}
    moved = {r["part"]: r for r in drift_from_stats(r1.stats, r2.stats).collect()}
    r1.release()
    r2.release()
    assert set(moved) == {"p0000", "p0001"}
    for p, r in moved.items():
        assert r["column"] == "pixels"
        assert r["ks_d"] > r["ks_threshold"]  # requantize flagged
        assert same[p]["ks_d"] == 0.0  # identical runs score zero
