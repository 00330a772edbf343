"""Dup-storm scale safety (round-2 verdict item 1): a single key
duplicated 10^5 times — the exact pathology a uniqueness validator
exists to survive — must flow through the keyed pass with BOUNDED
copy arrays (max_copies cap) while every count-derived verdict stays
exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdime_spark.operators.base import SuiteContext
from bigdime_spark.operators.keyed import KeyedSnapshotPass
from bigdime_spark.operators.uniqueness import Uniqueness

STORM_COPIES = 100_000


def _storm_frame(spark, n_parts: int = 4, cap_prefix: str = "cap-"):
    """(image_id, part, caption): one hot key with 10^5 copies spread
    over n_parts partitions + 50 healthy unique keys."""
    storm = spark.range(STORM_COPIES).select(
        F.lit("hot-key").alias("image_id"),
        F.concat(F.lit("p"), (F.col("id") % n_parts).cast("string")).alias("part"),
        F.concat(F.lit(cap_prefix), (F.col("id") % 3).cast("string")).alias("caption"),
    )
    healthy = spark.range(50).select(
        F.concat(F.lit("ok-"), F.col("id").cast("string")).alias("image_id"),
        F.lit("p0").alias("part"),
        F.lit("healthy").alias("caption"),
    )
    return storm.unionByName(healthy)


def test_keyed_pass_survives_dup_storm_with_bounded_arrays(spark):
    raw = _storm_frame(spark)
    # curated captions differ for the hot key → the mismatch is visible
    # inside the capped sample (identical tables would only mismatch in
    # the sampled-away tail, the documented detail degradation)
    cur = _storm_frame(spark, cap_prefix="CUR-")
    ctx = SuiteContext(spark=spark, raw=raw, curated=cur, manifest=None, parts=None)
    keyed = KeyedSnapshotPass(max_copies=100)

    j = keyed._joined(ctx)
    hot = j.filter(F.col("image_id") == "hot-key").select(
        "n_r", "n_c", F.size("copies_r").alias("sr"), F.size("copies_c").alias("sc")
    ).collect()[0]
    # counts EXACT, arrays bounded by the cap
    assert hot["n_r"] == STORM_COPIES
    assert hot["n_c"] == STORM_COPIES
    assert hot["sr"] == 100
    assert hot["sc"] == 100

    results = dict(
        (name, (v, viol)) for name, v, viol in keyed.run(ctx)
    )
    name = "uniqueness.image_id"
    verdicts, violations = results[name]
    vrows = {r["part"]: r for r in verdicts.collect()}
    # the hot key's sampled copies are sort_array-deterministic: the
    # first 100 (part, caption) structs in sorted order all land in p0
    # (caption sorts after part), so p0 carries the FAIL attribution
    assert "p0" in vrows and vrows["p0"]["verdict"] == "FAIL"
    # violation detail is top-K sampled — bounded, never 10^5 rows
    n_viol = violations.filter(F.col("image_id") == "hot-key").count()
    assert 0 < n_viol <= 100
    # detail message still reports the EXACT copy count
    detail = violations.filter(F.col("image_id") == "hot-key").select("detail").first()[0]
    assert f"({STORM_COPIES} copies)" in detail

    # caption-equality mismatch detection still fires (mixed captions
    # exist inside the sampled arrays)
    cap_verdicts, _ = results["caption_equality"]
    assert cap_verdicts.filter(F.col("verdict") == "FAIL").count() > 0

    for df in ctx.extras.get("persisted", []):
        df.unpersist()


def test_standalone_uniqueness_bounded(spark):
    raw = _storm_frame(spark)
    ctx = SuiteContext(spark=spark, raw=raw, curated=None, manifest=None, parts=None)
    ctx.parts = raw.select("part").distinct()
    verdicts, violations = Uniqueness("image_id", max_copies=100).run(ctx)
    assert violations.filter(F.col("image_id") == "hot-key").count() <= 100
    # exact count survives in the message
    detail = violations.filter(F.col("image_id") == "hot-key").select("detail").first()[0]
    assert f"({STORM_COPIES} copies)" in detail
    assert verdicts.filter(F.col("verdict") == "FAIL").count() >= 1
