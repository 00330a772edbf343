"""Round-2 suite plan properties: the clean-run violation-rescan gate
(one scan of raw, not two), curated-only parts surviving the verdict
grid, and the decode empty-input guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.decode import decode_check_multi
from bigdime_spark.operators.stats import ColumnProfile, StatsProfile
from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.schema import FAIL
from bigdime_spark.sources.synth import build_fixture


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def raw_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gatefx"))
    fx = build_fixture(spark, n_rows=200, n_parts=4)
    fx.raw.repartition("part").write.partitionBy("part").parquet(f"{d}/raw")
    return f"{d}/raw"


def _suite():
    return ValidationSuite(
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        not_null=("image_id", "caption"),
    )


def test_violation_rescan_gated_on_clean_run(spark, raw_parquet):
    """Clean run: every row-level counter in the (already materialized)
    fused agg is zero → the violations plan must NOT contain the
    row-level rescan of raw. The cached fused frame's own scan still
    prints inside its InMemoryRelation, so the assertion is
    differential: the dirty violations plan has exactly one more
    parquet scan (the rescan) than the clean one."""
    raw = spark.read.parquet(raw_parquet)
    clean = _suite().run(spark, raw, run_id="gate-clean")
    # the rescan's explode alias `_vs` is its plan fingerprint
    assert "_vs" not in _explain(clean.violations)
    assert clean.violations.count() == 0
    clean.release()

    dirty_raw = raw.withColumn(
        "caption",
        F.when(F.col("image_id") == "img-000000000003", F.lit(None)).otherwise(
            F.col("caption")
        ),
    )
    dirty = _suite().run(spark, dirty_raw, run_id="gate-dirty")
    viol = dirty.violations.filter(F.col("constraint") == "not_null.caption").collect()
    assert [v["image_id"] for v in viol] == ["img-000000000003"]
    assert "_vs" in _explain(dirty.violations)
    dirty.release()


def test_curated_only_part_fails_in_verdicts(spark):
    """ADVICE r01: a FAIL on a partition present ONLY in curated
    (spurious rows) must reach the verdict table, not just violations."""
    raw = spark.createDataFrame(
        [("p0", "img-0", "cap a"), ("p0", "img-1", "cap b")],
        "part string, image_id string, caption string",
    )
    curated = raw.unionByName(
        spark.createDataFrame(
            [("p9", "img-ghost", "cap g")],
            "part string, image_id string, caption string",
        )
    )
    suite = ValidationSuite(
        declared_schema=raw.schema,
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_domains=False,
        check_drift=False,
        stats=StatsProfile(columns=[ColumnProfile("caption", stringlike=True)]),
    )
    res = suite.run(spark, raw, curated, run_id="ghost-part")
    ref = {
        (r["part"], r["verdict"])
        for r in res.verdicts.filter(F.col("constraint") == "referential").collect()
    }
    assert ("p9", FAIL) in ref  # the curated-only part's FAIL survives the grid
    assert ("p0", "PASS") in ref
    res.release()


def test_decode_empty_frames_raises(spark):
    with pytest.raises(ValueError, match="at least one snapshot"):
        decode_check_multi({}, seed=42)
