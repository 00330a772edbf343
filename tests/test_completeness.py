"""Completeness / structural-integrity oracles (operators/completeness):
null-pattern joint distribution is exact and csv-stable, sequence
continuity separates gaps from dups (and goes NOT_READY on an id-less
part), functional-dependency violations are exact, bounded and
deterministically attributed — and the plans stay Expand-free /
TakeOrdered-bounded.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdime_spark.operators.completeness import (
    FunctionalDependency,
    SequenceContinuity,
    fd_violations,
    null_pattern_profile,
    sequence_continuity,
)
from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
from bigdime_spark.schema import FAIL, NOT_READY, PASS


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _suite(**kw) -> ValidationSuite:
    return ValidationSuite(
        not_null=(),
        check_record_count=False,
        check_checksum=False,
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        stats=StatsProfile(columns=[]),
        **kw,
    )


# ------------------------------------------------------------- C40

def test_null_pattern_exact_joint_counts(spark):
    rows = (
        [("p0", 1.0, 2.0)] * 4        # none
        + [("p0", None, 2.0)] * 3     # a
        + [("p0", 1.0, None)] * 2     # b
        + [("p0", None, None)] * 1    # a,b
        + [("p1", None, None)] * 5    # a,b only
    )
    df = spark.createDataFrame(rows, "part string, a double, b double")
    got = {
        (r["part"], r["pattern"]): (r["n_rows"], r["frac"])
        for r in null_pattern_profile(df, ["a", "b"], part_col="part").collect()
    }
    assert got == {
        ("p0", "none"): (4, 0.4),
        ("p0", "a"): (3, 0.3),
        ("p0", "b"): (2, 0.2),
        ("p0", "a,b"): (1, 0.1),
        ("p1", "a,b"): (5, 1.0),
    }


def test_null_pattern_global_and_column_order(spark):
    """part_col=None profiles the whole table; the pattern csv lists
    null columns in the CALLER's order, not schema order."""
    df = spark.createDataFrame(
        [(None, 1.0, None)], "x double, y double, z double"
    )
    (r,) = null_pattern_profile(df, ["z", "x"], part_col=None).collect()
    assert r["pattern"] == "z,x"
    assert r["n_rows"] == 1 and r["frac"] == 1.0


# ------------------------------------------------------------- B30

def _ids(part: str, ids: list[int | None]) -> list[tuple[str, int | None]]:
    return [(part, i) for i in ids]


def test_sequence_continuity_gaps_vs_dups(spark):
    rows = (
        _ids("dense", [0, 1, 2, 3, 4])
        + _ids("gappy", [0, 1, 5, 6])          # span 7, 4 distinct → 3 gaps
        + _ids("dupped", [0, 1, 1, 2, 2, 2])   # 6 rows, 3 distinct → 3 dups
        + _ids("nullish", [None, None])        # no non-null ids
        + _ids("mixed", [10, None, 11, 13])    # 1 gap, 1 null
    )
    df = spark.createDataFrame(rows, "part string, seq long")
    got = {r["part"]: r for r in sequence_continuity(df, "seq").collect()}
    assert (got["dense"]["gaps"], got["dense"]["dups"]) == (0, 0)
    assert (got["gappy"]["gaps"], got["gappy"]["dups"]) == (3, 0)
    assert (got["dupped"]["gaps"], got["dupped"]["dups"]) == (0, 3)
    assert got["dupped"]["n_rows"] == 6 and got["dupped"]["n_distinct"] == 3
    assert got["nullish"]["n_distinct"] == 0
    assert got["nullish"]["gaps"] is None and got["nullish"]["dups"] is None
    assert got["nullish"]["n_null"] == 2
    assert (got["mixed"]["gaps"], got["mixed"]["n_null"]) == (1, 1)
    assert (got["mixed"]["min_id"], got["mixed"]["max_id"]) == (10, 13)


def test_sequence_continuity_whole_table(spark):
    df = spark.createDataFrame([(i,) for i in (3, 4, 6)], "seq long")
    (r,) = sequence_continuity(df, "seq", part_col=None).collect()
    assert (r["n_rows"], r["n_distinct"], r["gaps"], r["dups"]) == (3, 3, 1, 0)


def test_sequence_continuity_plan_has_no_expand(spark):
    """The two-level form must not plan the multi-distinct Expand
    rewrite — that rewrite multiplies every raw row and is the reason
    countDistinct stays out of big fused aggregations."""
    df = spark.range(100).select(
        (F.col("id") % 4).cast("string").alias("part"), F.col("id").alias("seq")
    )
    plan = _explain(sequence_continuity(df, "seq"))
    assert "Expand" not in plan


def test_sequence_continuity_in_suite(spark):
    rows = (
        [("ok", f"i{i}", i) for i in range(5)]
        + [("holey", f"h{i}", v) for i, v in enumerate([0, 1, 9])]
        + [("replay", f"r{i}", v) for i, v in enumerate([0, 1, 1, 2])]
        + [("idless", "x0", None), ("idless", "x1", None)]
    )
    df = spark.createDataFrame(rows, "part string, image_id string, seq long")
    suite = _suite(extra_table_constraints=[SequenceContinuity("seq")])
    res = suite.run(spark, df, run_id="seqc")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "sequence_continuity.seq"
        ).collect()
    }
    assert v == {"ok": PASS, "holey": FAIL, "replay": FAIL, "idless": NOT_READY}
    res.release()


def test_sequence_continuity_span_overflow_fails_loudly(spark):
    """A hash-like id column spanning ±2^63 overflows max−min+1: the
    profile reports NULL gaps (try_-arithmetic, no ANSI crash) and the
    suite constraint FAILs the part with observed gaps=overflow."""
    rows = [
        ("p", "a", -(2**62)),          # fits int64; max−min overflows
        ("p", "b", 3 * (2**61)),
        ("p", "c", 12345),
    ]
    df = spark.createDataFrame(rows, "part string, image_id string, seq long")
    (r,) = sequence_continuity(df, "seq").collect()
    assert r["gaps"] is None and r["n_distinct"] == 3
    suite = _suite(extra_table_constraints=[SequenceContinuity("seq")])
    res = suite.run(spark, df, run_id="seqc-ovf")
    (v,) = res.verdicts.filter(
        F.col("constraint") == "sequence_continuity.seq"
    ).collect()
    assert v["verdict"] == FAIL
    assert "gaps=overflow" in v["observed"]
    res.release()


def test_sequence_continuity_rejects_non_integral_and_negative_budget(spark):
    """A string id column is a clean ValueError (the CLI's exit-2
    contract rides on it), not an AnalysisException out of
    try_subtract; a negative max_gaps budget is rejected at
    declaration time (it would FAIL even a perfect sequence)."""
    import pytest

    df = spark.createDataFrame([("p", "abc")], "part string, seq string")
    with pytest.raises(ValueError, match="must be an integral type"):
        sequence_continuity(df, "seq")
    with pytest.raises(ValueError, match="no column"):
        sequence_continuity(df, "absent")
    with pytest.raises(ValueError, match="max_gaps must be >= 0"):
        SequenceContinuity("seq", max_gaps=-1)


def test_sequence_continuity_max_gaps_budget(spark):
    df = spark.createDataFrame(
        [("p", f"i{i}", v) for i, v in enumerate([0, 1, 5])],
        "part string, image_id string, seq long",
    )
    lax = _suite(extra_table_constraints=[SequenceContinuity("seq", max_gaps=3)])
    res = lax.run(spark, df, run_id="seqc-lax")
    (r,) = res.verdicts.filter(
        F.col("constraint") == "sequence_continuity.seq"
    ).collect()
    assert r["verdict"] == PASS and "gaps=3" in r["observed"]
    res.release()


# ------------------------------------------------------------- C41

def test_fd_violations_exact_and_null_excluded(spark):
    rows = [
        ("sku1", "brandA"), ("sku1", "brandA"), ("sku1", "brandB"),  # violates: 2 deps
        ("sku2", "brandC"), ("sku2", "brandC"),                      # clean
        ("sku3", None),                                              # null dep ignored
        (None, "brandZ"),                                            # null det ignored
        ("sku4", "b1"), ("sku4", "b2"), ("sku4", "b3"),              # violates: 3 deps
    ]
    df = spark.createDataFrame(rows, "sku string, brand string")
    got = fd_violations(df, "sku", "brand").collect()
    assert [(r["det"], r["n_dep"], r["n_rows"]) for r in got] == [
        ("sku4", 3, 3),
        ("sku1", 2, 3),
    ]


def test_fd_violations_top_k_deterministic(spark):
    """With every det tied on (n_dep, n_rows), the cap must cut by det
    ascending — the bounded result is reproducible run over run."""
    rows = [(f"d{i:03d}", dep) for i in range(20) for dep in ("x", "y")]
    df = spark.createDataFrame(rows, "det_c string, dep_c string")
    got = fd_violations(df, "det_c", "dep_c", top_k=5).collect()
    assert [r["det"] for r in got] == [f"d{i:03d}" for i in range(5)]
    plan = _explain(fd_violations(df, "det_c", "dep_c", top_k=5))
    assert "TakeOrderedAndProject" in plan


def test_fd_in_suite_part_attribution(spark):
    """A det split across two parts with two dep values fails BOTH
    parts; clean parts get PASS from the grid; the bounded violation
    sample attributes each det to its heaviest part."""
    rows = (
        # img-1 appears in p0 (twice) and p1 (once) with different phash
        [("p0", "img-1", 7), ("p0", "img-1", 7), ("p1", "img-1", 8)]
        # img-2 clean in p1
        + [("p1", "img-2", 9)]
        # p2 entirely clean
        + [("p2", "img-3", 10), ("p2", "img-4", 11)]
    )
    df = spark.createDataFrame(rows, "part string, image_id string, ph long")
    suite = _suite(extra_table_constraints=[FunctionalDependency("image_id", "ph")])
    res = suite.run(spark, df, run_id="fdc")
    v = {
        r["part"]: r
        for r in res.verdicts.filter(
            F.col("constraint") == "fd.image_id->ph"
        ).collect()
    }
    assert {p: r["verdict"] for p, r in v.items()} == {
        "p0": FAIL,
        "p1": FAIL,
        "p2": PASS,
    }
    assert "violating_dets=1" in v["p0"]["observed"]
    assert "rows=2" in v["p0"]["observed"]  # two p0 rows of img-1
    assert "rows=1" in v["p1"]["observed"]
    viol = res.violations.filter(F.col("constraint") == "fd.image_id->ph").collect()
    assert len(viol) == 1
    assert viol[0]["image_id"] == "img-1"
    assert viol[0]["part"] == "p0"  # heaviest part wins attribution
    assert "2 distinct ph values" in viol[0]["detail"]
    res.release()


def test_fd_violations_match_python_reference_property(spark):
    """Property (SURVEY §5.3): on hypothesis-drawn (det, dep) multisets
    the engine's violation scan equals a pure-python reference exactly
    — fan-out counts, row counts, ordering and the top-k cut."""
    from collections import Counter, defaultdict

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    rows_strategy = st.lists(
        st.tuples(
            st.sampled_from([f"d{i}" for i in range(6)]),
            st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
        ),
        min_size=0,
        max_size=40,
    )

    @given(rows=rows_strategy, top_k=st.integers(min_value=1, max_value=4))
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows, top_k):
        deps = defaultdict(set)
        nrows = Counter()
        for det, dep in rows:
            if det is None or dep is None:
                continue
            deps[det].add(dep)
            nrows[det] += 1
        expected = sorted(
            (
                (det, len(vs), nrows[det])
                for det, vs in deps.items()
                if len(vs) > 1
            ),
            key=lambda t: (-t[1], -t[2], t[0]),
        )[:top_k]
        df = spark.createDataFrame(
            rows or [("pad", None)], "det string, dep string"
        )
        got = [
            (r["det"], r["n_dep"], r["n_rows"])
            for r in fd_violations(df, "det", "dep", top_k=top_k).collect()
        ]
        assert got == expected, (rows, top_k)

    check()


def test_null_pattern_matches_python_reference_property(spark):
    """Property: the joint null-mask distribution equals a Counter over
    the drawn rows for every mask combination."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    cell = st.one_of(st.none(), st.just(1.0))
    rows_strategy = st.lists(
        st.tuples(cell, cell, cell), min_size=1, max_size=30
    )

    @given(rows=rows_strategy)
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(rows):
        ref = Counter(
            ",".join(n for n, v in zip(("a", "b", "c"), r) if v is None) or "none"
            for r in rows
        )
        df = spark.createDataFrame(rows, "a double, b double, c double")
        got = {
            r["pattern"]: r["n_rows"]
            for r in null_pattern_profile(df, ["a", "b", "c"], part_col=None).collect()
        }
        assert got == dict(ref), rows

    check()


def test_fd_violation_sample_is_bounded(spark):
    rows = [("p", f"i{k}", f"k{k:04d}", d) for k in range(50) for d in ("a", "b")]
    df = spark.createDataFrame(rows, "part string, image_id string, det string, dep string")
    suite = _suite(
        extra_table_constraints=[FunctionalDependency("det", "dep", max_violations=7)]
    )
    res = suite.run(spark, df, run_id="fd-cap")
    viol = res.violations.filter(F.col("constraint") == "fd.det->dep").collect()
    assert len(viol) == 7
    assert sorted(r["image_id"] for r in viol) == [f"k{i:04d}" for i in range(7)]
    res.release()


# ------------------------------------------------------------- B30b

def _gap_import():
    from bigdime_spark.operators.completeness import gap_ranges

    return gap_ranges


def test_gap_ranges_exact_and_null_safe(spark):
    gap_ranges = _gap_import()
    rows = (
        [("dense", i) for i in range(10, 15)]
        # holes 2-4 and 6-8
        + [("gappy", i) for i in (0, 1, 5, 9)]
        # duplicate ids collapse before the window: {0,0,2} → one 1-1 hole
        + [("dupped", i) for i in (0, 0, 2)]
        + [("nullish", None), ("nullish", None)]
        + [("mixed", i) for i in (7, 8, None)]
    )
    df = spark.createDataFrame(rows, "part string, seq long")
    by_part: dict[str, list] = {}
    for r in gap_ranges(df, "seq").collect():
        by_part.setdefault(r["part"], []).append(
            (r["gap_start"], r["gap_end"], r["gap_len"])
        )
    assert by_part == {
        "gappy": [(2, 4, 3), (6, 8, 3)],
        "dupped": [(1, 1, 1)],
    }


def test_gap_ranges_cap_keeps_first_by_start_and_whole_table(spark):
    gap_ranges = _gap_import()
    df = spark.createDataFrame(
        [("p", i) for i in (0, 2, 4, 6, 8, 10)], "part string, seq long"
    )
    capped = gap_ranges(df, "seq", max_ranges=2).collect()
    assert sorted((r["gap_start"], r["gap_end"]) for r in capped) == [(1, 1), (3, 3)]
    assert len(gap_ranges(df, "seq", max_ranges=100).collect()) == 5
    # part_col=None: one global window, same holes
    whole = gap_ranges(df, "seq", part_col=None).collect()
    assert [tuple(r) for r in whole] == [
        (1, 1, 1), (3, 3, 1), (5, 5, 1), (7, 7, 1), (9, 9, 1)
    ]


def test_gap_ranges_guards(spark):
    import pytest

    gap_ranges = _gap_import()
    df = spark.createDataFrame([("p", 1)], "part string, seq long")
    with pytest.raises(ValueError, match="max_ranges"):
        gap_ranges(df, "seq", max_ranges=0)
    with pytest.raises(ValueError, match="integral"):
        gap_ranges(df, "part")
    with pytest.raises(ValueError, match="no column"):
        gap_ranges(df, "nope")


def test_gap_ranges_overflow_hole_is_loud(spark):
    """A hole wider than int64 (hash-like id space spanning ±2^63) is
    emitted with NULL gap_len — the profile's NULL-gaps rule — never
    dropped or wrapped."""
    gap_ranges = _gap_import()
    lo, hi = -(2**62) - 10, 2**62 + 10  # width 2^63+21 > int64 max
    df = spark.createDataFrame([("p", lo), ("p", hi)], "part string, seq long")
    out = gap_ranges(df, "seq").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["gap_start"], r["gap_end"]) == (lo + 1, hi - 1)
    assert r["gap_len"] is None


def test_gap_ranges_totals_match_profile(spark):
    """Uncapped hole widths must sum to exactly the profile's gaps
    count on randomized key multisets (seeded)."""
    import random

    gap_ranges = _gap_import()
    rnd = random.Random(1234)
    for trial in range(4):
        keys = [rnd.randint(-40, 40) for _ in range(rnd.randint(1, 70))]
        df = spark.createDataFrame(
            [("p", int(k)) for k in keys], "part string, seq long"
        )
        gaps = sequence_continuity(df, "seq").collect()[0]["gaps"]
        holes = gap_ranges(df, "seq", max_ranges=10_000).collect()
        assert sum(r["gap_len"] for r in holes) == gaps, keys
