"""Compliance constraint (C55, deequ's Compliance analyzer):
tolerance-bounded predicate fractions — verdict branches, NULL
collapse, suite fusion, and the config section."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.row_checks import Compliance
from bigdime_spark.plans.config import suite_from_config
from bigdime_spark.schema import FAIL, PASS


def _run_standalone(spark, df, cons):
    from bigdime_spark.operators.base import fused_agg_exprs

    out = df.groupBy("part").agg(*fused_agg_exprs(cons))
    sel = [F.col("part")] + [
        c.verdict_col().alias(c.name) for c in cons
    ] + [F.round(c._frac(), 6).alias(f"{c.name}__frac") for c in cons]
    return {r["part"]: r for r in out.select(*sel).collect()}


def test_compliance_verdict_branches(spark):
    """p0 fully satisfies (PASS), p1 sits at 0.8 against a 0.9 bound
    (FAIL), p1 against a 0.8 bound PASSes — ≥ is inclusive."""
    rows = [("p0", float(i)) for i in range(10)]
    rows += [("p1", float(i)) for i in range(8)] + [("p1", -1.0), ("p1", -2.0)]
    df = spark.createDataFrame(rows, "part string, v double")
    tight = Compliance("nonneg_tight", F.col("v") >= 0, "v", 0.9)
    exact = Compliance("nonneg_exact", F.col("v") >= 0, "v", 0.8)
    got = _run_standalone(spark, df, [tight, exact])
    assert got["p0"][tight.name] == PASS and got["p0"][exact.name] == PASS
    assert got["p1"][tight.name] == FAIL
    assert got["p1"][exact.name] == PASS  # frac == bound is a PASS
    assert got["p1"][f"{tight.name}__frac"] == 0.8


def test_compliance_null_predicate_counts_dirty(spark):
    """NULL predicate results collapse to non-satisfying: a part whose
    predicate cannot evaluate on half its rows has frac 0.5, not 1.0."""
    rows = [("p0", "x")] * 5 + [("p0", None)] * 5
    df = spark.createDataFrame(rows, "part string, s string")
    # `s = s` is NULL (not true) for NULL s — the three-valued trap
    con = Compliance("s_known", F.col("s") == F.col("s"), "s", 0.6)
    got = _run_standalone(spark, df, [con])
    assert got["p0"][f"{con.name}__frac"] == 0.5
    assert got["p0"][con.name] == FAIL


def test_compliance_min_fraction_validated():
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError, match="min_fraction"):
            Compliance("x", F.lit(True), "v", bad)


def test_compliance_rides_the_suite_and_emits_no_row_violations(spark):
    """Fused into the suite's single stats pass: part-level verdicts
    land in the verdict table; NO violation rows are emitted (inside
    the declared tolerance a failing row is expected dirt)."""
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite

    rows = [("p0", f"a{i}", float(i % 10)) for i in range(20)]
    rows += [("p1", f"b{i}", float(-(i % 4 == 0) or i % 10)) for i in range(20)]
    df = spark.createDataFrame(rows, "part string, image_id string, v double")
    suite = ValidationSuite(
        declared_schema=df.schema,
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        extra_agg_constraints=[Compliance("v_nonneg", F.col("v") >= 0, "v", 0.9)],
    )
    res = suite.run(spark, df, run_id="compliance-suite")
    v = {
        r["part"]: (r["verdict"], r["observed"], r["expected"])
        for r in res.verdicts.filter(
            F.col("constraint") == "compliance.v_nonneg"
        ).collect()
    }
    assert v["p0"][0] == PASS and v["p0"][1] == "frac=1.0"
    assert v["p1"][0] == FAIL
    assert v["p1"][2] == "frac>=0.9"
    viol = res.violations.filter(
        F.col("constraint").startswith("compliance.")
    ).count()
    assert viol == 0
    res.release()


def test_compliance_config_section(spark):
    suite = suite_from_config(
        {
            "compliance": [
                {
                    "name": "caption_nonempty",
                    "column": "caption",
                    "predicate": "length(trim(caption)) > 0",
                    "min_fraction": 0.995,
                    "detail": "empty captions above tolerance",
                }
            ]
        }
    )
    cons = [c for c in suite.extra_agg_constraints if isinstance(c, Compliance)]
    assert len(cons) == 1
    assert cons[0].name == "compliance.caption_nonempty"
    assert cons[0].min_fraction == 0.995
    assert cons[0].detail == "empty captions above tolerance"


@pytest.mark.parametrize(
    "entry,frag",
    [
        ({"name": "x", "column": "v"}, "missing required keys"),
        (
            {"name": "x", "column": "v", "predicate": "v>0",
             "min_fraction": "0.9"},
            "must be a number",
        ),
        (
            {"name": "x", "column": "v", "predicate": "v>0",
             "min_fraction": 1.5},
            "min_fraction",
        ),
        (
            {"name": "x", "column": "v", "predicate": "v>0",
             "min_fraction": 0.9, "bogus": 1},
            "unknown keys",
        ),
    ],
)
def test_compliance_config_rejects(entry, frag):
    with pytest.raises(ValueError, match=frag):
        suite_from_config({"compliance": [entry]})


def test_shared_count_emitted_once_for_many_bounds(spark):
    """k Compliance bounds share ONE per-part row counter in the fused
    aggregation (the shared_agg_exprs dedup) — not k identical ones."""
    from bigdime_spark.operators.base import fused_agg_exprs

    df = spark.createDataFrame([("p0", 1.0)], "part string, v double")
    cons = [
        Compliance("a", F.col("v") > 0, "v", 0.5),
        Compliance("b", F.col("v") < 10, "v", 0.5),
        Compliance("c", F.col("v") != 5, "v", 0.5),
    ]
    out = df.groupBy("part").agg(*fused_agg_exprs(cons))
    assert out.columns.count("comp__n") == 1
    assert {c._ok for c in cons} <= set(out.columns)


# ------------------------------------------------- property test (C55)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_CVAL = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))


@given(
    vals=st.lists(_CVAL, min_size=1, max_size=30),
    bound_pct=st.integers(min_value=0, max_value=100),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_compliance_property_vs_python_reference(spark, vals, bound_pct):
    """Random single-part frames: frac and verdict must match a pure
    python reference applying the same NULL-collapse and inclusive
    bound (bound chosen in percent so frac >= bound compares exactly
    representable quarters/hundredths often enough to exercise the
    boundary)."""
    bound = bound_pct / 100.0
    df = spark.createDataFrame(
        [("p0", v) for v in vals], "part string, v int"
    )
    con = Compliance("nonneg", F.col("v") >= 0, "v", bound)
    got = _run_standalone(spark, df, [con])["p0"]
    ok = sum(1 for v in vals if v is not None and v >= 0)
    frac = ok / len(vals)
    assert got[f"{con.name}__frac"] == round(frac, 6)
    assert got[con.name] == (PASS if frac >= bound else FAIL)
