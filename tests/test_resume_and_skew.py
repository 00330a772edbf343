"""Resume-from-checkpoint (SURVEY B26 / §5.5) and determinism-under-
parallelism oracles, plus the drift FAIL path on a shifted fixture.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.sources.synth import build_fixture

N_ROWS, N_PARTS = 320, 8


@pytest.fixture(scope="module")
def fixture(spark):
    return build_fixture(spark, n_rows=N_ROWS, n_parts=N_PARTS)


def test_resume_skips_validated_parts(spark, fixture, tmp_path_factory):
    lin_dir = str(tmp_path_factory.mktemp("lineage"))
    suite = ValidationSuite(check_decode=False)
    r1 = suite.run(
        spark, fixture.raw, fixture.curated, fixture.manifest,
        run_id="r1", lineage_path=lin_dir,
    )
    lin1 = r1.lineage.collect()
    assert len(lin1) == N_PARTS
    assert sum(r["rows_scanned"] for r in lin1) == N_ROWS

    # second run over the SAME lineage store: everything already
    # VALIDATED → zero partitions re-validated (BASELINE.json:14)
    r2 = suite.run(
        spark, fixture.raw, fixture.curated, fixture.manifest,
        run_id="r2", lineage_path=lin_dir,
    )
    lin2 = r2.lineage.collect()
    assert len(lin2) == 0 or sum(r["rows_scanned"] for r in lin2) == 0


def test_resume_revalidates_only_unfinished(spark, fixture, tmp_path_factory):
    """Simulate a kill after k partitions: seed the lineage store with
    VALIDATED rows for half the parts; the rerun must scan only the
    other half."""
    lin_dir = str(tmp_path_factory.mktemp("lineage_half"))
    done = [f"p{i:04d}" for i in range(N_PARTS // 2)]
    spark.createDataFrame(
        [("seed", p, "VALIDATED", N_ROWS // N_PARTS, 0, 0) for p in done],
        "run_id string, part string, status string, rows_scanned long, violations long, wall_ms long",
    ).write.mode("overwrite").parquet(lin_dir)

    suite = ValidationSuite(check_decode=False)
    r = suite.run(
        spark, fixture.raw, fixture.curated, fixture.manifest,
        run_id="r3", lineage_path=lin_dir,
    )
    lin = {row["part"]: row for row in r.lineage.collect()}
    assert set(lin) == {f"p{i:04d}" for i in range(N_PARTS // 2, N_PARTS)}
    assert sum(row["rows_scanned"] for row in lin.values()) == N_ROWS // 2


def test_failed_parts_are_revalidated(spark, fixture, tmp_path_factory):
    lin_dir = str(tmp_path_factory.mktemp("lineage_failed"))
    spark.createDataFrame(
        [("seed", "p0000", "FAILED", 40, 1, 0)],
        "run_id string, part string, status string, rows_scanned long, violations long, wall_ms long",
    ).write.mode("overwrite").parquet(lin_dir)
    r = ValidationSuite(check_decode=False).run(
        spark, fixture.raw, fixture.curated, fixture.manifest,
        run_id="r4", lineage_path=lin_dir,
    )
    parts = {row["part"] for row in r.lineage.collect()}
    assert "p0000" in parts and len(parts) == N_PARTS  # FAILED is retried


def test_drift_fixture_fails_exactly_the_shifted_part(spark):
    fx = build_fixture(spark, n_rows=N_ROWS, n_parts=N_PARTS, drift_parts=(1,))
    r = ValidationSuite(check_decode=False).run(
        spark, fx.raw, fx.curated, fx.manifest, run_id="drift"
    )
    vm = {
        (row["part"], row["constraint"]): row["verdict"]
        for row in r.verdicts.collect()
        if row["constraint"].startswith("drift_")
    }
    # the shifted part fails w/h drift; every other part passes everything
    assert vm[("p0001", "drift_ks.w")] == "FAIL"
    assert vm[("p0001", "drift_psi.w")] == "FAIL"
    for (part, c), v in vm.items():
        if part != "p0001":
            assert v == "PASS", (part, c, v)


def test_verdicts_identical_across_parallelism(fixture, spark):
    """Determinism under parallelism (SURVEY §5.4): the same input
    produces byte-identical verdicts at a different shuffle width."""
    base = ValidationSuite(check_decode=False).run(
        spark, fixture.raw, fixture.curated, fixture.manifest, run_id="d1"
    )
    rows1 = sorted(
        (r["part"], r["constraint"], r["verdict"], r["observed"], r["expected"])
        for r in base.verdicts.collect()
    )
    repart = ValidationSuite(check_decode=False).run(
        spark,
        fixture.raw.repartition(13),
        fixture.curated.repartition(7),
        fixture.manifest,
        run_id="d2",
    )
    rows2 = sorted(
        (r["part"], r["constraint"], r["verdict"], r["observed"], r["expected"])
        for r in repart.verdicts.collect()
    )
    assert rows1 == rows2


def test_salted_aggregation_matches_plain(spark, fixture):
    """B27: the deterministic two-level salted aggregation returns the
    same counts as a direct groupBy on a hot key."""
    df = fixture.raw.select("phash", "part")
    ns = 8
    salted = (
        df.withColumn("_salt", F.pmod(F.xxhash64("part"), F.lit(ns)))
        .groupBy("phash", "_salt")
        .agg(F.count(F.lit(1)).alias("c1"))
        .groupBy("phash")
        .agg(F.sum("c1").alias("n"))
    )
    plain = df.groupBy("phash").agg(F.count(F.lit(1)).alias("n"))
    diff = salted.join(plain, "phash").filter(salted["n"] != plain["n"]).count()
    assert diff == 0


def test_decode_validates_curated_snapshot_too(spark):
    """Curated-side payload corruption must surface via decode.curated
    (the reference validates the LANDED copy, not just the source)."""
    fx = build_fixture(spark, n_rows=160, n_parts=4)
    bad_id = "img-000000000006"  # lands in p0002
    curated = fx.curated.withColumn(
        "bytes",
        F.when(F.col("image_id") == bad_id, F.expr("substring(bytes, 1, 5)")).otherwise(
            F.col("bytes")
        ),
    )
    r = ValidationSuite(check_decode=True, decode_seed=42).run(
        spark, fx.raw, curated, fx.manifest, run_id="cur-decode"
    )
    vm = {(row["part"], row["constraint"]): row["verdict"] for row in r.verdicts.collect()}
    assert vm[("p0002", "decode.curated")] == "FAIL"
    assert vm[("p0002", "decode")] == "PASS"  # raw side untouched
    viol = {
        (row["constraint"], row["image_id"], row["snapshot"])
        for row in r.violations.collect()
    }
    assert ("decode.curated", bad_id, "curated") in viol
