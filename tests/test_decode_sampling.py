"""Sampled decode (operators/decode.DecodeIntegrity sample_rate): the
10^12-row posture for the engine's one Python-side pass — decode a
deterministic hash-selected fraction. Selection matches the
operators/sampling hash exactly, corruption outside the sample is
(by design) not seen by decode while checksum still catches it, and
the checksum never rides a sampled scan.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.decode import DecodeIntegrity
from bigdime_spark.operators.sampling import SAMPLE_SPACE
from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
from bigdime_spark.sources.synth import InjectionSpec, build_fixture

RATE = 0.5
SEED = "decode-sample"


def _in_sample(image_id: str, rate: float = RATE, seed: str = SEED) -> bool:
    h = int(hashlib.md5(f"{image_id}:{seed}".encode()).hexdigest()[:10], 16)
    return h < int(rate * SAMPLE_SPACE)


def _pick_ids(n_rows: int):
    ids = [f"img-{i:012d}" for i in range(n_rows)]
    inside = next(i for i in ids if _in_sample(i))
    outside = next(i for i in ids if not _in_sample(i))
    return inside, outside


def test_sampled_decode_sees_only_the_sample(spark):
    """Corrupt one payload inside the hash sample and one outside:
    sampled decode flags exactly the in-sample one; the out-of-sample
    corruption is the full-scan checksum's catch, not decode's."""
    inside, outside = _pick_ids(64)
    fx = build_fixture(
        spark, n_rows=64, n_parts=2,
        spec=InjectionSpec(bitflip_bytes=(inside, outside)),
    )
    suite = ValidationSuite(
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
        decode_seed=42,
        decode_snapshots=("raw",),
        decode_sample_rate=RATE,
    )
    res = suite.run(spark, fx.raw, run_id="dsample")
    viol = res.violations.filter(F.col("constraint") == "decode").collect()
    assert [r["image_id"] for r in viol] == [inside]
    res.release()

    # full-rate decode catches BOTH — the sample is the only difference
    full = ValidationSuite(
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
        decode_seed=42,
        decode_snapshots=("raw",),
    )
    res2 = full.run(spark, fx.raw, run_id="dfull")
    got = sorted(
        r["image_id"]
        for r in res2.violations.filter(F.col("constraint") == "decode").collect()
    )
    assert got == sorted([inside, outside])
    res2.release()


def test_sampled_decode_with_checksum_does_not_ride(spark):
    """check_checksum + sampled decode: the checksum must NOT ride the
    sampled scan — on a pristine fixture every checksum verdict still
    PASSes against the full-table manifest, proving it hashed every
    row via its own scan."""
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    suite = ValidationSuite(
        not_null=(),
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        check_decode=True,
        decode_seed=42,
        decode_snapshots=("raw",),
        decode_sample_rate=0.25,
    )
    res = suite.run(spark, fx.raw, manifest=fx.manifest, run_id="dride")
    cs = {r["part"]: r["verdict"] for r in res.verdicts.filter(
        F.col("constraint") == "checksum").collect()}
    assert cs == {"p0000": "PASS", "p0001": "PASS"}
    dec = res.verdicts.filter(
        (F.col("constraint") == "decode") & (F.col("verdict") != "PASS")
    ).count()
    assert dec == 0
    res.release()


def test_sample_rate_validation():
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="sample_rate"):
            DecodeIntegrity(sample_rate=bad)
    with pytest.raises(ValueError, match="carry_checksum requires"):
        DecodeIntegrity(sample_rate=0.5, carry_checksum=True)


def test_sample_is_repartition_invariant(spark):
    """The hash predicate selects the same ids regardless of layout."""
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    tc = DecodeIntegrity(seed=42, sample_rate=RATE)
    from bigdime_spark.operators.base import SuiteContext

    ids = set()
    for frame in (fx.raw, fx.raw.repartition(7)):
        from bigdime_spark.operators.sampling import uniform_sample

        sampled = uniform_sample(frame, "image_id", RATE, SEED)
        ids_now = {r["image_id"] for r in sampled.select("image_id").collect()}
        ids = ids or ids_now
        assert ids_now == ids
    expected = {r["image_id"] for r in fx.raw.select("image_id").collect()
                if _in_sample(r["image_id"])}
    assert ids == expected
    assert tc.sample_rate == RATE  # ctor stored it
