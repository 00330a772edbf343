"""Property-based oracle (SURVEY §5.3): hypothesis draws a violation
spec, the generator synthesizes a table containing exactly those
defects, and the engine must report precisely the injected set — no
false positives, no false negatives.

Examples are deliberately few (Spark jobs per example); the drawn
space still covers the cross-product of defect kinds.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdime_spark.plans.suite import ValidationSuite
from bigdime_spark.sources.synth import InjectionSpec, build_fixture

N_ROWS, N_PARTS = 120, 4
IDS = [f"img-{i:012d}" for i in range(N_ROWS)]
PARTS = [f"p{i:04d}" for i in range(N_PARTS)]


def _part_of(image_id: str) -> str:
    return f"p{int(image_id.split('-')[1]) % N_PARTS:04d}"


spec_strategy = st.builds(
    InjectionSpec,
    null_caption=st.sets(st.sampled_from(IDS), max_size=2).map(tuple),
    dup_image_id=st.sets(
        st.tuples(st.sampled_from(IDS), st.sampled_from(PARTS)), max_size=1
    ).map(tuple),
    orphan_raw=st.sets(st.sampled_from(IDS), max_size=2).map(tuple),
    caption_edit=st.sets(st.sampled_from(IDS), max_size=2).map(tuple),
    count_mismatch=st.sets(st.sampled_from(PARTS), max_size=1).map(tuple),
    missing_manifest=st.sets(st.sampled_from(PARTS), max_size=1).map(tuple),
)


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@given(spec=spec_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_engine_reports_exactly_the_injected_set(sparkref, spec):
    spark = sparkref
    fx = build_fixture(spark, n_rows=N_ROWS, n_parts=N_PARTS, spec=spec)
    res = ValidationSuite(
        not_null=("image_id", "caption"), check_decode=False
    ).run(spark, fx.raw, fx.curated, fx.manifest, run_id="prop")

    verdict = {
        (r["part"], r["constraint"]): r["verdict"] for r in res.verdicts.collect()
    }
    viol = {
        (r["constraint"], r["part"], r["image_id"])
        for r in res.violations.collect()
    }
    res.release()

    # --- not_null.caption: exactly the injected ids, their parts FAIL
    for vid in spec.null_caption:
        assert ("not_null.caption", _part_of(vid), vid) in viol
    for p in PARTS:
        injected_here = any(_part_of(v) == p for v in spec.null_caption)
        expected = "FAIL" if injected_here else "PASS"
        assert verdict[(p, "not_null.caption")] == expected, (p, spec.null_caption)

    # --- uniqueness: both the original and target partitions fail
    for vid, target in spec.dup_image_id:
        assert ("uniqueness.image_id", _part_of(vid), vid) in viol
        assert ("uniqueness.image_id", target, vid) in viol
        assert verdict[(_part_of(vid), "uniqueness.image_id")] == "FAIL"
        assert verdict[(target, "uniqueness.image_id")] == "FAIL"

    # --- referential: orphan_raw ids (dropped from curated) reported
    dup_targets = {t for _, t in spec.dup_image_id}
    for vid in spec.orphan_raw:
        assert ("referential", _part_of(vid), vid) in viol
    # no spurious referential violations beyond injected orphans and
    # duplicate copies landing in foreign partitions
    ref_viol = {v for v in viol if v[0] == "referential"}
    allowed = {("referential", _part_of(v), v) for v in spec.orphan_raw} | {
        ("referential", t, v) for v, t in spec.dup_image_id
    }
    assert ref_viol <= allowed, ref_viol - allowed

    # --- record count / manifest semantics: actual = pristine + dup
    # copies landed in p; expected = pristine + (1 if count_mismatch).
    # The two +1s can cancel (dup into the same mismatched part).
    for p in PARTS:
        v = verdict[(p, "record_count")]
        delta_actual = sum(1 for _, t in spec.dup_image_id if t == p)
        delta_expected = 1 if p in spec.count_mismatch else 0
        if p in spec.missing_manifest:
            assert v == "SKIPPED_CONFIG"
        elif delta_actual != delta_expected:
            assert v == "FAIL", (p, spec)
        else:
            assert v == "PASS", (p, spec)

    # --- caption equality: injected edits (and nulled captions, which
    # differ byte-wise from curated) — nothing else
    cap_viol = {v for v in viol if v[0] == "caption_equality"}
    allowed_cap = {
        ("caption_equality", _part_of(v), v)
        for v in set(spec.caption_edit) | set(spec.null_caption)
        if v not in spec.orphan_raw  # orphans have no curated row to compare
    } | {
        # a duplicated id's foreign-part copy carries the PRISTINE
        # caption (the generator duplicates the pre-injection row), so
        # it mismatches exactly when the CURATED side was edited — the
        # engine rightly attributes that copy to its landing part
        ("caption_equality", t, v)
        for v, t in spec.dup_image_id
        if v in spec.caption_edit and v not in spec.orphan_raw
    }
    assert cap_viol == allowed_cap, cap_viol ^ allowed_cap
