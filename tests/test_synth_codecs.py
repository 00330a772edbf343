"""Codec + generator unit tests (pure numpy, no Spark)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from bigdime_spark.sources import synth


@pytest.mark.parametrize("fmt", ["raw", "ppm", "pngz", "rawq7", "rawq6", "rawq4"])
def test_codec_roundtrip(fmt):
    pixels = synth.make_pixels(42, "img-x", 32, 48)
    payload = synth.encode(pixels, fmt)
    decoded = synth.decode(payload, fmt, 32, 48)
    if fmt.startswith("rawq"):
        assert np.array_equal(decoded, synth.quantize(pixels, int(fmt[4:])))
    else:
        assert np.array_equal(decoded, pixels)


def test_decode_rejects_corruption():
    pixels = synth.make_pixels(42, "img-x", 32, 32)
    for fmt in ["raw", "ppm", "pngz", "rawq6"]:
        payload = synth.encode(pixels, fmt)[:-1]  # the bitflip_bytes injection
        with pytest.raises(Exception):
            synth.decode(payload, fmt, 32, 32)
    with pytest.raises(ValueError):
        synth.decode(b"xx", "bogus", 32, 32)


def test_quantisation_psnr_analytic():
    """rawq7/rawq6 clear the 40 dB bar, rawq5/rawq4 do not (FIXTURES F2)."""
    pixels = synth.make_pixels(7, "img-q", 128, 128)
    measured = {}
    for k in (7, 6, 5, 4):
        q = synth.quantize(pixels, k)
        measured[k] = synth.psnr(pixels, q)
        # truncation error ~ U{0..Δ-1}: MSE ≈ Δ²/3 with Δ=2^(8-k)
        delta = 2 ** (8 - k)
        analytic = 10 * math.log10(255**2 / ((delta - 1) * (2 * delta - 1) / 6))
        assert abs(measured[k] - analytic) < 1.0
    assert measured[7] >= 40 and measured[6] >= 40
    assert measured[5] < 40 and measured[4] < 40


def test_phash_is_stable_and_discriminative():
    a = synth.make_pixels(42, "img-a", 64, 64)
    assert synth.phash64(a) == synth.phash64(a.copy())
    b = synth.make_pixels(42, "img-b", 64, 64)
    assert synth.phash64(a) != synth.phash64(b)


def test_row_generation_is_pure_function_of_seed_and_id():
    r1 = synth._gen_row(42, 17, 4, synth.SIZES, frozenset(), synth.FMTS)
    r2 = synth._gen_row(42, 17, 4, synth.SIZES, frozenset(), synth.FMTS)
    assert r1 == r2
    r3 = synth._gen_row(43, 17, 4, synth.SIZES, frozenset(), synth.FMTS)
    assert r1 != r3
