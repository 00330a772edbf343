"""Bit-balance degeneracy detector (operators/bitbalance): exact
per-bit fractions, the stuck-bit filter, and the suite-level
constraint (FAIL on a masked partition, PASS on healthy hashes,
SKIPPED_CONFIG on all-null) riding the fused stats aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.bitbalance import (
    BitBalance,
    bit_balance,
    degenerate_bits,
)
from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.schema import FAIL, PASS, SKIPPED_CONFIG
from bigdime_spark.sources.synth import build_fixture


def test_exact_fractions_tiny_frame(spark):
    # values 0b01, 0b11, 0b10, null → bit0 set on 2/3, bit1 on 2/3
    df = spark.createDataFrame(
        [("a", 1), ("a", 3), ("a", 2), ("a", None)], "part string, hv long"
    )
    rows = {
        r["bit"]: r
        for r in bit_balance(df, "hv", "part", n_bits=3).collect()
    }
    assert rows[0]["n_rows"] == 3 and rows[0]["n_set"] == 2
    assert rows[1]["n_set"] == 2 and rows[2]["n_set"] == 0
    assert rows[2]["frac"] == 0.0
    assert abs(rows[0]["frac"] - round(2 / 3, 6)) < 1e-9


def test_sign_bit_readable(spark):
    # bit 63 via arithmetic shiftright must still read 0/1, not -1
    df = spark.createDataFrame([(-1,), (1,)], "hv long")
    rows = {r["bit"]: r for r in bit_balance(df, "hv", None, 64).collect()}
    assert rows[63]["n_set"] == 1 and rows[0]["n_set"] == 2


def test_degenerate_bits_filter(spark):
    df = (
        spark.range(1000)
        .select(F.xxhash64("id").alias("hv"))
        # stick bits 60-63 at 0
        .select((F.col("hv").bitwiseAND(F.lit((1 << 60) - 1))).alias("hv"))
    )
    bad = degenerate_bits(df, "hv", None, 64, lo=0.02, hi=0.98)
    assert {r["bit"] for r in bad.collect()} == {60, 61, 62, 63}


def test_bounds_guard(spark):
    with pytest.raises(ValueError):
        BitBalance("phash", lo=0.5, hi=0.5)
    with pytest.raises(ValueError):
        bit_balance(spark.range(1), "id", None, n_bits=65)


def test_suite_bit_balance_verdicts(spark):
    """One partition's phash masked to 48 bits → FAIL with stuck_bits
    in the observed detail; healthy partitions PASS; an all-null
    partition is SKIPPED_CONFIG. The constraint rides the fused agg
    (no extra scan), so the suite still runs end-to-end green
    elsewhere."""
    fx = build_fixture(spark, n_rows=64 * 4, n_parts=4)
    # healthy balanced hash everywhere, then degrade p0001 (stuck top
    # 16 bits) and null out p0003 entirely
    raw = fx.raw.withColumn("phash", F.xxhash64("image_id"))
    raw = raw.withColumn(
        "phash",
        F.when(
            F.col("part") == "p0001",
            F.col("phash").bitwiseAND(F.lit((1 << 48) - 1)),
        )
        .when(F.col("part") == "p0003", F.lit(None).cast("long"))
        .otherwise(F.col("phash")),
    )
    suite = ValidationSuite(
        check_drift=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_bit_balance=True,
    )
    res = suite.run(spark, raw, None, manifest=None, resume=False)
    got = {
        r["part"]: r
        for r in res.verdicts.filter(
            F.col("constraint") == "bit_balance_phash"
        ).collect()
    }
    assert got["p0001"]["verdict"] == FAIL
    assert "min_frac=0.0" in got["p0001"]["observed"]
    # 16 stuck-at-zero bits (48..63)
    assert "stuck_bits=16" in got["p0001"]["observed"]
    assert got["p0000"]["verdict"] == PASS and got["p0002"]["verdict"] == PASS
    assert got["p0003"]["verdict"] == SKIPPED_CONFIG
    res.release()
