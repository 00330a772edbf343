"""Round-3 ride-correctness properties (ADVICE r2):

- a Checksum with a CUSTOM column list keeps its column set when it
  rides the decode scan (previously the ride silently hashed the
  default columns → spurious FAIL against a matching manifest);
- the ride's persisted frame holds only bad rows + per-batch checksum
  partials, never one row per input row, and the partial fold equals
  the batch checksum exactly;
- a bytelike stats profile on a binary column survives the ride
  (previously an unresolved-column AnalysisException);
- two Checksum constraints fail loudly instead of silently sharing
  one aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.functions.hashes import checksum_agg_exprs, row_checksum_col
from bigdime_spark.operators.checksum import Checksum
from bigdime_spark.operators.decode import decode_check_multi
from bigdime_spark.operators.stats import ColumnProfile, StatsProfile
from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.sources.synth import build_fixture

CUSTOM_COLS = ["image_id", "caption", "phash"]


@pytest.fixture(scope="module")
def fx(spark):
    return build_fixture(spark, n_rows=200, n_parts=4)


def _manifest_over(df, cols):
    return (
        df.withColumn("_h", row_checksum_col(cols))
        .groupBy("part")
        .agg(
            F.count(F.lit(1)).alias("expected_rows"),
            F.bit_xor("_h").alias("expected_xor"),
            F.sum(F.col("_h").cast("decimal(38,0)")).alias("expected_sum"),
        )
    )


def test_custom_checksum_columns_ride_decode_scan(spark, fx):
    manifest = _manifest_over(fx.raw, CUSTOM_COLS)
    suite = ValidationSuite(
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_decode=True,
        decode_seed=42,
        extra_agg_constraints=[Checksum(columns=CUSTOM_COLS)],
    )
    res = suite.run(spark, fx.raw, manifest=manifest, run_id="ride-custom")
    cs = {r["part"]: r["verdict"] for r in res.verdicts.filter(
        F.col("constraint") == "checksum").collect()}
    assert cs and all(v == "PASS" for v in cs.values())
    dec = res.verdicts.filter(F.col("constraint") == "decode")
    assert dec.filter(F.col("verdict") != "PASS").count() == 0
    res.release()


def test_partial_checksum_frame_is_tiny_and_exact(spark, fx):
    n_rows = fx.raw.count()
    checked = decode_check_multi(
        {"raw": fx.raw},
        seed=42,
        hash_snapshots=("raw",),
        partial_checksums=True,
    ).cache()
    try:
        total = checked.count()
        n_partials = checked.filter(F.col("psum").isNotNull()).count()
        n_bad = checked.filter(~F.col("ok")).count()
        assert n_bad == 0  # pristine fixture
        assert total == n_partials
        assert 0 < total < n_rows / 2  # bounded by batches × parts, not rows
        got = (
            checked.filter(F.col("psum").isNotNull())
            .agg(
                F.bit_xor("rowhash").alias("actual_xor"),
                F.sum(F.col("psum").cast("decimal(38,0)")).alias("actual_sum"),
            )
            .collect()[0]
        )
        want = (
            fx.raw.withColumn("_h", row_checksum_col())
            .agg(*checksum_agg_exprs("_h"))
            .collect()[0]
        )
        assert got["actual_xor"] == want["actual_xor"]
        assert got["actual_sum"] == want["actual_sum"]
    finally:
        checked.unpersist()


def test_bytelike_profile_survives_ride(spark, fx):
    suite = ValidationSuite(
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_decode=True,
        decode_seed=42,
        stats=StatsProfile(
            columns=[
                ColumnProfile("bytes", bytelike=True),
                ColumnProfile("w", numeric=True),
            ]
        ),
    )
    manifest = _manifest_over(fx.raw, None)
    res = suite.run(spark, fx.raw, manifest=manifest, run_id="ride-bytelike")
    row = res.stats.collect()[0]
    assert row["stat__bytes__min_bytes"] > 0
    want = fx.raw.filter(F.col("part") == row["part"]).agg(
        F.sum(F.octet_length("bytes"))
    ).collect()[0][0]
    assert row["stat__bytes__sum_bytes"] == want
    res.release()


def test_two_checksums_raise(spark, fx):
    suite = ValidationSuite(
        check_checksum=True,
        extra_agg_constraints=[Checksum(columns=CUSTOM_COLS)],
    )
    with pytest.raises(ValueError, match="at most one Checksum"):
        suite.run(spark, fx.raw, run_id="two-cs")
