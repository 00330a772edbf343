"""End-to-end suite oracles — the reference's validation-handler unit
tests re-expressed as pytest oracles (BASELINE.json:6; FIXTURES.md F4).

One fixture with a known injected-violation spec; the engine must
report EXACTLY the injected set — right verdicts on the right
partitions, no false positives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.schema import FAIL, PASS, SKIPPED_CONFIG
from bigdime_spark.sources.synth import InjectionSpec, build_fixture

N_ROWS, N_PARTS = 64, 4

SPEC = InjectionSpec(
    null_caption=("img-000000000003",),  # lands in p0003
    dup_image_id=(("img-000000000005", "p0002"),),  # copy from p0001 into p0002
    bitflip_bytes=("img-000000000007",),  # p0003: checksum FAIL + decode violation
    orphan_raw=("img-000000000011",),  # p0003: missing from curated
    caption_edit=("img-000000000013",),  # p0001: curated caption differs
    count_mismatch=("p0001",),  # manifest off by one
    missing_manifest=("p0003",),  # → SKIPPED_CONFIG
)


@pytest.fixture(scope="module")
def result(spark):
    fx = build_fixture(spark, n_rows=N_ROWS, n_parts=N_PARTS, spec=SPEC)
    suite = ValidationSuite(
        not_null=("image_id", "caption", "w", "h", "fmt"),
        check_decode=True,
        decode_seed=42,
    )
    res = suite.run(spark, fx.raw, fx.curated, fx.manifest, run_id="oracle-run")
    res.verdicts.cache().count()
    res.violations.cache().count()
    return res


@pytest.fixture(scope="module")
def verdict_map(result):
    return {
        (r["part"], r["constraint"]): r["verdict"] for r in result.verdicts.collect()
    }


def test_record_count_verdicts(verdict_map):
    # p0000 pristine → PASS; p0001 manifest off by one → FAIL;
    # p0002 has a duplicated extra row → FAIL; p0003 missing manifest → SKIPPED_CONFIG
    assert verdict_map[("p0000", "record_count")] == PASS
    assert verdict_map[("p0001", "record_count")] == FAIL
    assert verdict_map[("p0002", "record_count")] == FAIL
    assert verdict_map[("p0003", "record_count")] == SKIPPED_CONFIG


def test_checksum_verdicts(verdict_map):
    # content changed in p0002 (dup row) — p0003 is SKIPPED (no manifest)
    assert verdict_map[("p0000", "checksum")] == PASS
    assert verdict_map[("p0001", "checksum")] == PASS  # count off, content intact
    assert verdict_map[("p0002", "checksum")] == FAIL
    assert verdict_map[("p0003", "checksum")] == SKIPPED_CONFIG


def test_not_null_verdicts(verdict_map):
    assert verdict_map[("p0003", "not_null.caption")] == FAIL
    for p in ("p0000", "p0001", "p0002"):
        assert verdict_map[(p, "not_null.caption")] == PASS
    for p in ("p0000", "p0001", "p0002", "p0003"):
        assert verdict_map[(p, "not_null.w")] == PASS


def test_uniqueness_cross_partition_attribution(verdict_map):
    # the dup spans p0001 (original) and p0002 (copy): BOTH fail (FIXTURES F4)
    assert verdict_map[("p0001", "uniqueness.image_id")] == FAIL
    assert verdict_map[("p0002", "uniqueness.image_id")] == FAIL
    assert verdict_map[("p0000", "uniqueness.image_id")] == PASS
    assert verdict_map[("p0003", "uniqueness.image_id")] == PASS


def test_referential_and_caption(verdict_map):
    assert verdict_map[("p0003", "referential")] == FAIL  # orphan_raw
    assert verdict_map[("p0001", "caption_equality")] == FAIL  # caption_edit
    assert verdict_map[("p0000", "referential")] == PASS
    assert verdict_map[("p0000", "caption_equality")] == PASS


def test_decode_verdicts(verdict_map):
    assert verdict_map[("p0003", "decode")] == FAIL  # corrupted payload
    for p in ("p0000", "p0001", "p0002"):
        assert verdict_map[(p, "decode")] == PASS


def test_schema_verdict(verdict_map):
    assert verdict_map[("*", "schema")] == PASS


def test_drift_passes_on_identical_snapshots(verdict_map):
    # null case (FIXTURES F4): identical distributions → PASS everywhere
    for p in ("p0000", "p0001", "p0002", "p0003"):
        for c in ("drift_ks.w", "drift_ks.h", "drift_ks.phash", "drift_psi.w"):
            assert verdict_map[(p, c)] == PASS


def test_violations_exact_set(result):
    rows = {
        (r["constraint"], r["part"], r["image_id"])
        for r in result.violations.collect()
    }
    expected = {
        ("not_null.caption", "p0003", "img-000000000003"),
        ("uniqueness.image_id", "p0001", "img-000000000005"),
        ("uniqueness.image_id", "p0002", "img-000000000005"),
        ("referential", "p0003", "img-000000000011"),
        ("caption_equality", "p0001", "img-000000000013"),
        # null caption raw-vs-curated also differs byte-wise:
        ("caption_equality", "p0003", "img-000000000003"),
        ("decode", "p0003", "img-000000000007"),
        # partition-level rows (no single offending image):
        ("record_count", "p0001", None),
        ("record_count", "p0002", None),
        ("checksum", "p0002", None),
    }
    assert rows == expected


def test_lineage_statuses(result):
    statuses = {r["part"]: r["status"] for r in result.lineage.collect()}
    assert statuses == {
        "p0000": "VALIDATED",
        "p0001": "FAILED",
        "p0002": "FAILED",
        "p0003": "FAILED",
    }
    rows_scanned = {r["part"]: r["rows_scanned"] for r in result.lineage.collect()}
    assert rows_scanned["p0002"] == N_ROWS // N_PARTS + 1  # the duplicate copy
    assert rows_scanned["p0000"] == N_ROWS // N_PARTS


def test_profile_outliers_flag_starved_part(spark):
    """check_profile_outliers: a part starved to ~5% of its siblings'
    rows must FAIL profile_outlier.stat__rows (robust z over the fused
    stats — no extra scan), a violation row must be synthesized with
    the z in its detail, and every healthy (part × outlier constraint)
    cell must be grid-filled PASS."""
    fx = build_fixture(spark, n_rows=30 * 16, n_parts=16)
    # ids are round-robin over parts (id i → part i%16), so "starve
    # p0003" must cut on the id VALUE: keep only its ids < 100
    # (7 rows vs 30 in every sibling)
    starved = fx.raw.filter(
        (F.col("part") != "p0003")
        | (F.substring("image_id", -4, 4).cast("int") < 100)
    )
    suite = ValidationSuite(
        check_drift=False,
        check_profile_outliers=True,
        outlier_metrics=("stat__rows",),
    )
    res = suite.run(spark, starved, fx.curated, manifest=None, resume=False)
    got = {
        (r["part"], r["constraint"]): r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "profile_outlier.stat__rows"
        ).collect()
    }
    assert got[("p0003", "profile_outlier.stat__rows")] == FAIL
    others = {k: v for k, v in got.items() if k[0] not in ("p0003", "*")}
    assert len(others) == 15 and set(others.values()) == {PASS}
    viol = res.violations.filter(
        F.col("constraint") == "profile_outlier.stat__rows"
    ).collect()
    # siblings are EXACTLY uniform → MAD=0 degenerate path: z is null,
    # the deviating value itself carries the evidence
    assert [v["part"] for v in viol] == ["p0003"]
    assert "value=7.0" in viol[0]["detail"] and "med=30.0" in viol[0]["detail"]
    res.release()
