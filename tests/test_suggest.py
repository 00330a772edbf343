"""Constraint suggestion (C57, plans/suggest — deequ's
ConstraintSuggestion): rule firing, the suggest → config → suite
round-trip, value escaping, refusals, and the CLI. SQL-oracle twin:
`suggest_constraints_orders` in the driver contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli
from bigdime_spark.plans.config import suite_from_config
from bigdime_spark.plans.suggest import (
    suggest_constraints,
    suggestions_frame,
    to_config,
)


def _sugg_set(suggestions):
    return {(s["column"], s["check"], s["params"]) for s in suggestions}


def test_rules_fire_on_planted_frame(spark):
    """One frame, every rule: ids (unique, non-null, non-negative),
    a categorical (isin), a stringly-typed number (type_conformance),
    and a 10%-null column below tol (compliance at the floored rate)."""
    rows = [
        (i, "cat_a" if i % 2 else "cat_b", str(100 + i),
         None if i < 2 else "x", 1.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, cat string, num_str string, mostly string, one double"
    )
    got = _sugg_set(suggest_constraints(df, tol_null=0.2))
    assert ("id", "not_null", "") in got
    assert ("id", "unique", "") in got
    assert ("id", "domain_check", "`id` >= 0") in got
    assert ("cat", "domain_check", "`cat` IN ('cat_a','cat_b')") in got
    assert ("num_str", "type_conformance", "bigint") in got
    # 2/20 null → rate 0.1 ≤ 0.2 → floor(0.9·100)/100 = 0.9
    assert ("mostly", "compliance",
            "`mostly` IS NOT NULL|min_fraction=0.9") in got
    # a nullable column never gets not_null; a non-unique one never unique
    assert ("mostly", "not_null", "") not in got
    assert ("cat", "unique", "") not in got
    # R7: observed numeric range → drift spec; a constant column's
    # collapsed range bumps hi to lo+1
    assert ("id", "drift_spec", "lo=0.0|hi=19.0|nbins=32") in got
    assert ("one", "drift_spec", "lo=1.0|hi=2.0|nbins=32") in got
    # R9: the dirt in `mostly` is bounded per cat segment at the worst
    # observed group rate (1 null in each 10-row group → 0.1)
    assert ("mostly", "grouped_bound",
            "group_by=cat|metric=null_rate|hi=0.1|min_support=10") in got
    # drift specs round-trip into the config section
    cfg = to_config(suggest_constraints(df, tol_null=0.2))
    assert {"column": "id", "lo": 0.0, "hi": 19.0, "nbins": 32} in cfg[
        "drift_specs"
    ]
    assert {"target": "mostly", "group_by": "cat", "metric": "null_rate",
            "hi": 0.1, "min_support": 10} in cfg["grouped_bounds"]


def test_part_granular_bounds_for_part_tables(spark):
    """Dirt concentrated in one part's one segment: R2's min_fraction
    and R9's hi must be derived at the GATE's granularity (per part /
    per (part, group)), not the whole table — otherwise the suggested
    config fails the very data that produced it."""
    rows = (
        [("pA", "x", None)] * 4 + [("pA", "x", "c")] * 6
        + [("pA", "y", "c")] * 10
        + [("pB", "x", "c")] * 10 + [("pB", "y", "c")] * 10
    )
    df = spark.createDataFrame(rows, "part string, fmt string, caption string")
    got = _sugg_set(suggest_constraints(df, tol_null=0.2))
    # overall rate 0.1 → naive mf 0.9; worst part pA is 4/20 = 0.2 → 0.8
    assert ("caption", "compliance",
            "`caption` IS NOT NULL|min_fraction=0.8") in got
    # worst (part, fmt) segment is (pA, x) = 0.4; worst (part, part)
    # group is pA = 0.2
    assert ("caption", "grouped_bound",
            "group_by=fmt|metric=null_rate|hi=0.4|min_support=10") in got
    assert ("caption", "grouped_bound",
            "group_by=part|metric=null_rate|hi=0.2|min_support=10") in got


def test_negative_min_blocks_nonneg_and_high_card_blocks_isin(spark):
    rows = [(float(i - 5), f"v{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "x double, s string")
    got = _sugg_set(suggest_constraints(df))
    assert not any(c == "domain_check" and "x >= 0" in p
                   for _, c, p in got)
    # 10 distinct over 10 rows fails the rows >= 10*distinct support gate
    assert not any(c == "domain_check" and "IN (" in p for _, c, p in got)


def test_isin_quote_escaping_yields_parseable_predicate(spark):
    rows = [("it's", ), ("plain", )] * 10
    df = spark.createDataFrame(rows, "s string")
    sugg = suggest_constraints(df)
    isin = [s for s in sugg if "IN (" in s["params"]][0]
    assert isin["params"] == "`s` IN ('it''s','plain')"
    # the suggested predicate must be valid Spark SQL over the frame
    assert df.filter(F.expr(isin["params"])).count() == 20


def test_suggest_to_config_round_trip_suite_passes(spark):
    """The loop closer: suggestions from a pristine fixture build a
    config whose suite PASSes on the very data that produced it —
    not one suggested constraint may FAIL."""
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=128, n_parts=4)
    sugg = suggest_constraints(fx.raw)  # bytes auto-excluded (binary)
    assert all(s["column"] != "bytes" for s in sugg)
    cfg = to_config(sugg)
    assert "not_null" in cfg and "image_id" in cfg["not_null"]
    assert cfg.get("unique_key") in ("caption", "image_id")
    # R8: every string column gets a widened max-length bound
    assert any(
        s2["check"] == "domain_check"
        and s2["params"].startswith("length(`caption`)")
        for s2 in sugg
    )
    # R10: the caption column gets its text-quality and language-mix
    # contract derived from the data (worst-part floored/ceil'd)
    assert any(s2["check"] == "caption_quality" for s2 in sugg)
    assert any(s2["check"] == "caption_lang" for s2 in sugg)
    assert cfg["caption_quality_bounds"][0]["metric"] == "quality_score"
    assert cfg["caption_lang_bounds"][0]["lang"] == "und"
    # image-shaped frame → payload conformance flipped on
    from bigdime_spark.plans.suggest import suggest_image_checks

    cfg.update(suggest_image_checks(fx.raw))
    assert cfg["check_payload_conformance"] is True
    suite = suite_from_config(cfg)
    res = suite.run(spark, fx.raw, run_id="suggest-rt")
    fails = (
        res.verdicts.filter(F.col("verdict") == "FAIL")
        .select("constraint")
        .distinct()
        .collect()
    )
    assert fails == [], [r["constraint"] for r in fails]
    res.release()


def test_refusals(spark):
    df = spark.createDataFrame([(1, bytearray(b"x"))], "a bigint, b binary")
    # explicit unprofilable column → loud
    with pytest.raises(ValueError, match="unprofilable"):
        suggest_constraints(df, columns=["b"])
    with pytest.raises(ValueError, match="not in frame"):
        suggest_constraints(df, columns=["nope"])
    with pytest.raises(ValueError, match="tol_null"):
        suggest_constraints(df, tol_null=0.0)
    with pytest.raises(ValueError, match="max_values"):
        suggest_constraints(df, max_values=0)
    with pytest.raises(ValueError, match="min_support"):
        suggest_constraints(df, min_support=0)
    only_bin = spark.createDataFrame([(bytearray(b"x"),)], "b binary")
    with pytest.raises(ValueError, match="no profilable"):
        suggest_constraints(only_bin)


def test_suggestions_frame_schema(spark):
    df = spark.createDataFrame([(1,), (2,)], "id bigint")
    fr = suggestions_frame(spark, suggest_constraints(df))
    assert fr.columns == [
        "column", "check", "params", "n_rows", "n_null", "n_distinct",
    ]
    assert fr.count() >= 2


def test_cli_suggest_e2e(spark, tmp_path_factory, capsys):
    """suggest → --out config → run --config on the same table exits
    0; bad --columns exits 2."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("suggest")
    fx = build_fixture(spark, n_rows=64, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    capsys.readouterr()
    rc = cli.main(["suggest", "--input", f"{d}/raw",
                   "--out", f"{d}/cfg.json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["n_suggestions"] >= 5
    assert out["config"]["check_payload_conformance"] is True
    assert out["config"] == json.load(open(f"{d}/cfg.json"))
    capsys.readouterr()
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/vout",
                     "--run-id", "r1", "--config", f"{d}/cfg.json"]) == 0
    capsys.readouterr()
    assert cli.main(["suggest", "--input", f"{d}/raw",
                     "--columns", "bytes"]) == 2


def test_zero_row_table_suggests_nothing(spark):
    df = spark.createDataFrame([], "a bigint, s string")
    assert suggest_constraints(df) == []


# ------------------------------------------------- property test (C57)
# hypothesis draws a small 2-column frame from an alphabet where Spark
# and pure-python castability agree exactly; suggest_constraints must
# match an independent python reference on the full suggestion set.

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_NUM = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_STR = st.one_of(st.none(), st.sampled_from(["x", "y", "1", "2", "3.5"]))
rows_strategy = st.lists(st.tuples(_NUM, _STR), min_size=0, max_size=25)

_TOL, _MAXV, _SUPP = 0.5, 3, 2


def _ref_suggest(rows):
    out = set()
    for idx, (name, is_num, is_str) in enumerate(
        (("a", True, False), ("s", False, True))
    ):
        vals = [r[idx] for r in rows]
        n = len(vals)
        nonnull = [v for v in vals if v is not None]
        nn, n_null = len(nonnull), n - len(nonnull)
        nd = len(set(nonnull))
        if n == 0:
            continue
        if n_null == 0:
            out.add((name, "not_null", ""))
        elif n_null / n <= _TOL:
            mf = math.floor((1.0 - n_null / n) * 100) / 100
            out.add((name, "compliance",
                     f"`{name}` IS NOT NULL|min_fraction={mf}"))
        if n_null == 0 and nd == n and n >= 2:
            out.add((name, "unique", ""))
        gated = (
            is_str and 1 <= nd <= _MAXV and n >= _SUPP * nd
        )
        if gated:
            vlist = ",".join(f"'{v}'" for v in sorted(set(nonnull)))
            out.add((name, "domain_check", f"`{name}` IN ({vlist})"))
        if is_num and nonnull and min(nonnull) >= 0:
            out.add((name, "domain_check", f"`{name}` >= 0"))
        if is_str and nn > 0 and not gated:
            if all(v in ("1", "2") for v in nonnull):
                out.add((name, "type_conformance", "bigint"))
            elif all(v in ("1", "2", "3.5") for v in nonnull):
                out.add((name, "type_conformance", "double"))
        if is_num and nonnull:
            lo = float(math.floor(min(nonnull)))
            hi = float(math.ceil(max(nonnull)))
            if hi <= lo:
                hi = lo + 1.0
            out.add((name, "drift_spec", f"lo={lo}|hi={hi}|nbins=32"))
        if is_str and nonnull:
            b = 1 << max(0, max(len(v) for v in nonnull) - 1).bit_length()
            out.add((name, "domain_check", f"length(`{name}`) <= {b}"))
    # R9: grouped null-rate bounds for (enum dim × dirty column)
    cols = {"a": 0, "s": 1}
    dirty = sorted(
        name for name, idx in cols.items()
        if rows and 0 < sum(1 for r in rows if r[idx] is None) <= _TOL * len(rows)
    )
    dims = []
    svals = [r[1] for r in rows]
    snn = [v for v in svals if v is not None]
    if (
        "s" not in dirty
        and 1 <= len(set(snn)) <= _MAXV
        and len(svals) >= _SUPP * len(set(snn))
        and len(svals) > 0
    ):
        dims = ["s"]
    for g in dims:
        for t in dirty:
            by_group: dict = {}
            for r in rows:
                by_group.setdefault(r[cols[g]], []).append(r[cols[t]])
            worst = None
            for gv, tvals in by_group.items():
                if len(tvals) < _SUPP:
                    continue
                rate = sum(1 for v in tvals if v is None) / len(tvals)
                worst = rate if worst is None else max(worst, rate)
            if worst is None:
                continue
            hi = min(1.0, math.ceil(round(worst * 100, 6)) / 100)
            out.add((t, "grouped_bound",
                     f"group_by={g}|metric=null_rate|hi={hi}|min_support={_SUPP}"))
    return out


@given(rows=rows_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_suggest_property_vs_python_reference(spark, rows):
    df = spark.createDataFrame(rows, "a bigint, s string")
    got = _sugg_set(
        suggest_constraints(
            df, tol_null=_TOL, max_values=_MAXV, min_support=_SUPP
        )
    )
    assert got == _ref_suggest(rows)


def test_backslash_values_and_awkward_column_names_round_trip(spark):
    """Review findings: backslashes in values must survive the Spark
    literal escaping, and non-identifier column names (spaces,
    reserved words) must be backtick-quoted so the generated config
    loads and the predicates match exactly."""
    rows = [("a\\b",), ("plain",)] * 10
    df = spark.createDataFrame(rows, "s string")
    isin = [
        x for x in suggest_constraints(df) if "IN (" in x["params"]
    ][0]
    assert df.filter(F.expr(isin["params"])).count() == 20
    # a value ENDING in a backslash must not swallow the close quote
    tail = spark.createDataFrame([("a\\",), ("b",)] * 10, "s string")
    isin2 = [
        x for x in suggest_constraints(tail) if "IN (" in x["params"]
    ][0]
    assert tail.filter(F.expr(isin2["params"])).count() == 20

    awkward = spark.createDataFrame(
        [(1, "x", None), (2, "y", "z"), (3, "x", "z"), (4, "y", "z")] * 5,
        ["order date", "from", "mostly null"],
    )
    sugg = suggest_constraints(awkward, tol_null=0.5)
    cfg = to_config(sugg)
    suite = suite_from_config(cfg)  # must not raise ParseException
    preds = [c.predicate for c in suite.extra_agg_constraints]
    assert preds  # at least the isin/nonneg/compliance checks built
    got = {s2["params"] for s2 in sugg}
    assert "`order date` >= 0" in got
    assert "`from` IN ('x','y')" in got
    assert any(p.startswith("`mostly null` IS NOT NULL") for p in got)
