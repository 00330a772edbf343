"""Image-quality curation gate riding the decode pass (C49):
flat/dark/bright detection per decoded image, image_quality[.snap]
verdicts with per-image violations. No SQL oracle is possible (the
pixel stats exist only behind the Python decoder) — pytest oracles
per the B20/C15 convention.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigdime_spark.functions.hashes import row_checksum_col
from bigdime_spark.operators.decode import DecodeIntegrity, _quality_flags
from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
from bigdime_spark.sources import synth
from bigdime_spark.sources.synth import generate_images

FLAT_ID = "img-000000000003"


def test_quality_flags_unit():
    flat = np.full((8, 8, 3), 0x77, dtype=np.uint8)
    dark = np.full((8, 8, 3), 2, dtype=np.uint8)
    dark[0, 0, 0] = 200  # std ~ 14 — not flat at min_std 8
    rng = np.random.default_rng(7)
    noisy = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert _quality_flags(flat, (8.0, None, None)).startswith("flat(std=0.00")
    assert _quality_flags(flat, (None, 16.0, 240.0)) is None  # mean 119 in range
    assert _quality_flags(dark, (8.0, 16.0, 240.0)).startswith("dark(")
    assert _quality_flags(255 - dark, (8.0, 16.0, 240.0)).startswith("bright(")
    # combined: flat AND dark flags join with ';'
    both = _quality_flags(np.zeros((4, 4, 3), dtype=np.uint8), (8.0, 16.0, None))
    assert "flat(" in both and ";dark(" in both
    assert _quality_flags(noisy, (8.0, 16.0, 240.0)) is None


def _with_flat_image(spark, n_rows=32, n_parts=2):
    """Deterministic table with ONE constant-pixel image: payload
    honestly re-encoded and phash RE-STAMPED, so decode integrity
    passes — only the quality gate can see it."""
    base = generate_images(spark, n_rows, n_parts=n_parts, fmts=("raw",))
    row = base.filter(F.col("image_id") == FLAT_ID).first()
    flat = np.full((row["h"], row["w"], 3), 0x77, dtype=np.uint8)
    return base.withColumn(
        "bytes",
        F.when(F.col("image_id") == FLAT_ID, F.lit(flat.tobytes())).otherwise(
            F.col("bytes")
        ),
    ).withColumn(
        "phash",
        F.when(
            F.col("image_id") == FLAT_ID, F.lit(synth.phash64(flat))
        ).otherwise(F.col("phash")),
    )


def _suite(**kw):
    base = dict(
        not_null=("image_id",),
        check_record_count=False,
        check_checksum=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        check_decode=True,
        decode_quality_min_std=8.0,
    )
    base.update(kw)
    return ValidationSuite(**base)


def test_flat_image_fails_only_its_part(spark):
    df = _with_flat_image(spark)
    res = _suite().run(spark, df, df, run_id="iq1")
    v = {(r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()}
    viol = [
        r
        for r in res.violations.collect()
        if r["constraint"].startswith("image_quality")
    ]
    res.release()
    flat_part = f"p{3 % 2:04d}"
    other = f"p{(3 + 1) % 2:04d}"
    for fam in ("image_quality", "image_quality.curated"):
        assert v[(flat_part, fam)] == "FAIL"
        assert v[(other, fam)] == "PASS"
    # decode integrity is blind to it — the phash was re-stamped
    assert v[(flat_part, "decode")] == "PASS"
    assert {r["snapshot"] for r in viol} == {"raw", "curated"}
    for r in viol:
        assert r["image_id"] == FLAT_ID
        assert r["detail"].startswith("flat(std=0.00<8")


def test_max_flagged_tolerance(spark):
    df = _with_flat_image(spark)
    res = _suite(decode_quality_max_flagged=1).run(spark, df, df, run_id="iq2")
    v = {(r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()}
    res.release()
    # one flagged image per snapshot-part is now within tolerance
    assert all(
        verdict == "PASS"
        for (p, c), verdict in v.items()
        if c.startswith("image_quality")
    )


def test_quality_survives_checksum_ride(spark):
    """partial_checksums mode folds ok rows away — flagged ok rows
    must still surface (the `qual is None` carve-out)."""
    df = _with_flat_image(spark)
    manifest = (
        df.withColumn("_h", row_checksum_col())
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("expected_rows"),
            F.bit_xor("_h").alias("expected_xor"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("expected_sum"),
        )
    )
    res = _suite(
        check_checksum=True, check_record_count=True, decode_snapshots=("raw",)
    ).run(spark, df, df, manifest, run_id="iq3")
    v = {(r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()}
    res.release()
    flat_part = f"p{3 % 2:04d}"
    assert v[(flat_part, "image_quality")] == "FAIL"
    for p in ("p0000", "p0001"):
        assert v[(p, "checksum")] == "PASS"
        assert v[(p, "record_count")] == "PASS"


def test_dark_bright_bounds(spark):
    """The synthetic corpus is uniform (mean ~127.5) — a tight mean
    band flags every image; a generous one flags none."""
    df = generate_images(spark, 8, n_parts=1, fmts=("raw",))
    checked_tight = DecodeIntegrity(
        snapshots=("raw",), quality_mean_lo=126.0, quality_mean_hi=129.0
    )
    assert checked_tight._quality_spec == (None, 126.0, 129.0)
    res = _suite(
        decode_quality_min_std=None,
        decode_quality_mean_lo=200.0,  # everything is darker than this
        decode_quality_mean_hi=None,
        decode_snapshots=("raw",),
    ).run(spark, df, run_id="iq4")
    v = {(r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()}
    n_viol = res.violations.filter(
        F.col("constraint") == "image_quality"
    ).count()
    res.release()
    assert v[("p0000", "image_quality")] == "FAIL"
    assert n_viol == 8  # every image flagged dark


def test_rejections(spark):
    with pytest.raises(ValueError, match="inverted"):
        DecodeIntegrity(quality_mean_lo=200.0, quality_mean_hi=100.0)
    with pytest.raises(ValueError, match="max_flagged"):
        DecodeIntegrity(quality_min_std=8.0, quality_max_flagged=-1)
    with pytest.raises(ValueError, match="check_decode"):
        ValidationSuite(
            check_decode=False, decode_quality_min_std=8.0
        ).run(spark, generate_images(spark, 4, n_parts=1))


def test_config_fields():
    from bigdime_spark.plans.config import suite_from_config

    with pytest.raises(ValueError, match="check_decode"):
        suite_from_config({"decode_quality_min_std": 8.0})
    s = suite_from_config(
        {
            "check_decode": True,
            "decode_quality_min_std": 8.0,
            "decode_quality_mean_lo": 16.0,
            "decode_quality_mean_hi": 240.0,
            "decode_quality_max_flagged": 2,
        }
    )
    assert s.decode_quality_min_std == 8.0
    assert s.decode_quality_max_flagged == 2
