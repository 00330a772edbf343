"""Correlation-profile oracles (operators/stats.numeric_correlation /
correlation_shift): exact ±1 on linear data, NULL (never a throw) on
degenerate groups under ANSI mode, pairwise-complete counting, and a
one-exchange fused plan.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bigdime_spark.operators.stats import correlation_shift, numeric_correlation


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def _frame(spark):
    rows = []
    for i in range(1, 11):
        rows.append(("p0", float(i), 2.0 * i + 1.0, -3.0 * i))  # y=2x+1, z=-3x
    rows += [
        ("p1", 1.0, 5.0, None),   # NULL z: excluded from (x,z) pairs
        ("p1", 2.0, 5.0, 1.0),
        ("p1", 3.0, 5.0, 2.0),    # y constant on p1 → corr(x,y) NULL
    ]
    return spark.createDataFrame(rows, "part string, x double, y double, z double")


def test_linear_pairs_are_exactly_plus_minus_one(spark):
    out = numeric_correlation(_frame(spark), [("x", "y"), ("x", "z")])
    got = {(r["part"], r["pair"]): r for r in out.collect()}
    assert got[("p0", "x~y")]["corr"] == 1.0
    assert got[("p0", "x~y")]["n_pairs"] == 10
    assert got[("p0", "x~z")]["corr"] == -1.0


def test_degenerate_groups_yield_null_not_throw(spark):
    """Spark 4 ANSI mode makes F.corr throw DIVIDE_BY_ZERO on a
    zero-variance group; the try_divide composition must degrade to
    NULL — the same answer DuckDB's corr gives."""
    out = numeric_correlation(_frame(spark), [("x", "y")])
    got = {r["part"]: r for r in out.collect()}
    assert got["p1"]["corr"] is None  # y is constant on p1
    single = spark.createDataFrame([("p0", 1.0, 2.0)], "part string, x double, y double")
    assert numeric_correlation(single, [("x", "y")]).collect()[0]["corr"] is None


def test_pairwise_complete_counting(spark):
    out = numeric_correlation(_frame(spark), [("x", "z")])
    got = {r["part"]: r for r in out.collect()}
    # the NULL-z row drops out of the pair population
    assert got["p1"]["n_pairs"] == 2
    assert got["p1"]["corr"] == 1.0  # (2,1),(3,2) → exactly linear


def test_correlation_shift_full_outer_surfaces_degenerates(spark):
    df = _frame(spark)
    cur = df.filter(F.col("part") == "p0")  # p1 missing from curated
    out = correlation_shift(df, cur, [("x", "y")])
    got = {r["part"]: r for r in out.collect()}
    assert got["p0"]["corr_shift"] == 0.0
    assert got["p1"]["corr_cur"] is None and got["p1"]["corr_shift"] is None


def test_plan_single_fused_exchange(spark):
    """All pairs' moments fuse into ONE hash-agg: exactly one shuffle
    exchange (on part), melt after the reduction."""
    out = numeric_correlation(_frame(spark), [("x", "y"), ("x", "z"), ("y", "z")])
    plan = _explain(out)
    exchanges = set(re.findall(r"\((\d+)\) Exchange", plan))
    broadcasts = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    assert len(exchanges - broadcasts) == 1, plan


def test_correlation_bound_rides_the_suite_stats_pass(spark):
    """CorrelationBound fuses into the suite's single agg: a part
    where y decouples from x FAILs, the linear part PASSes, a
    degenerate part is NOT_READY."""
    from bigdime_spark.operators.stats import CorrelationBound
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.schema import FAIL, NOT_READY, PASS

    rows = []
    for i in range(1, 11):
        rows.append(("p0", f"a{i}", float(i), 2.0 * i))          # corr = 1
        rows.append(("p1", f"b{i}", float(i), float((i * 7) % 10)))  # decoupled
    rows += [("p2", "c1", 1.0, 5.0)]                              # undefined
    df = spark.createDataFrame(rows, "part string, image_id string, x double, y double")
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
        extra_agg_constraints=[CorrelationBound("x", "y", lo=0.8, hi=1.0)],
    )
    res = suite.run(spark, df, run_id="corr-bound")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "correlation.x~y"
        ).collect()
    }
    assert v == {"p0": PASS, "p1": FAIL, "p2": NOT_READY}
    res.release()


# ------------------------------------------------- mutual information


def test_mutual_information_independent_and_determined(spark):
    """Planted structure: on p0, y is a FUNCTION of x (mi == h_x ==
    h_y, mi_norm == 1); on p1, x and y are exactly independent under
    the joint counts (mi == 0 while both entropies are 1 bit)."""
    from bigdime_spark.operators.stats import mutual_information

    rows = []
    # p0: x ∈ {a,b} determines y = upper(x); 4+4 rows
    for x, y in (("a", "A"), ("b", "B")):
        rows += [("p0", x, y)] * 4
    # p1: balanced 2x2 product distribution → independent
    for x in ("a", "b"):
        for y in ("A", "B"):
            rows += [("p1", x, y)] * 3
    df = spark.createDataFrame(rows, "part string, x string, y string")
    got = {r["part"]: r for r in mutual_information(df, "x", "y").collect()}

    p0 = got["p0"]
    assert p0["n_rows"] == 8
    assert p0["mi"] == 1.0 and p0["h_x"] == 1.0 and p0["h_y"] == 1.0
    assert p0["mi_norm"] == 1.0

    p1 = got["p1"]
    assert p1["n_rows"] == 12
    assert p1["mi"] == 0.0  # greatest(0, ·) also kills any -0.0
    assert p1["h_x"] == 1.0 and p1["h_y"] == 1.0
    assert p1["mi_norm"] == 0.0


def test_mutual_information_constant_column_is_null_norm(spark):
    """A constant side has zero entropy: MI is 0 and the normalized
    form is UNDEFINED (NULL via try_divide), never a division error —
    and rows with a NULL on either side are excluded from n_rows."""
    from bigdime_spark.operators.stats import mutual_information

    rows = [("p0", "a", "K"), ("p0", "b", "K"), ("p0", "b", "K"),
            ("p0", None, "K"), ("p0", "a", None)]
    df = spark.createDataFrame(rows, "part string, x string, y string")
    out = mutual_information(df, "x", "y").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 3  # NULL-sided rows excluded
    assert r["mi"] == 0.0 and r["h_y"] == 0.0
    assert r["mi_norm"] is None


def test_mutual_info_shift_surfaces_collapsed_side(spark):
    """correlation_shift's categorical twin: a curated side whose y
    column collapsed to a constant has UNDEFINED mi_norm — the shift
    row must surface with a NULL shift (full outer), not vanish; a
    clean pair shifts by exactly 0."""
    from bigdime_spark.operators.stats import mutual_info_shift

    raw_rows = []
    for x, y in (("a", "A"), ("b", "B")):
        raw_rows += [("p0", x, y)] * 4 + [("p1", x, y)] * 4
    raw = spark.createDataFrame(raw_rows, "part string, x string, y string")
    # curated: p0 unchanged; p1's y collapsed to a constant
    cur_rows = [r for r in raw_rows if r[0] == "p0"]
    cur_rows += [("p1", x, "K") for x in ("a", "b", "a", "b")]
    cur = spark.createDataFrame(cur_rows, "part string, x string, y string")

    got = {r["part"]: r for r in mutual_info_shift(raw, cur, "x", "y").collect()}
    assert got["p0"]["mi_shift"] == 0.0
    assert got["p0"]["mi_norm_raw"] == 1.0 and got["p0"]["mi_norm_cur"] == 1.0
    p1 = got["p1"]
    assert p1["mi_norm_raw"] == 1.0
    assert p1["mi_norm_cur"] is None  # constant side → undefined
    assert p1["mi_shift"] is None     # surfaced, not dropped


def test_mutual_information_single_data_scan(spark, tmp_path):
    """The scale contract: ONE pass over the data (the (part,x,y)
    hash-agg); every window/marginal computation operates on the
    joint-count relation, never rescanning the source. The physical
    plan must therefore contain exactly one parquet scan."""
    from bigdime_spark.operators.stats import mutual_information

    p = str(tmp_path / "mi_src")
    spark.createDataFrame(
        [("p0", "a", "A"), ("p0", "b", "B")] * 5,
        "part string, x string, y string",
    ).write.parquet(p)
    out = mutual_information(spark.read.parquet(p), "x", "y")
    plan = _explain(out)
    # formatted explain names each node once in the tree and once in
    # the detail section — count distinct "(N) Scan parquet" headings
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_mutual_information_matches_numpy_reference(spark):
    """Property test: operator MI/H values equal a direct numpy
    computation over the joint distribution on randomized small
    tables (seeded — no flaky draws)."""
    import math
    import random as _random

    from bigdime_spark.operators.stats import mutual_information

    rng = _random.Random(1234)
    for trial in range(4):
        rows = [
            ("p0", rng.choice("abcd"), rng.choice("ABC"))
            for _ in range(rng.randint(5, 60))
        ]
        got = mutual_information(
            spark.createDataFrame(rows, "part string, x string, y string"),
            "x", "y",
        ).collect()[0]

        n = len(rows)
        joint: dict[tuple[str, str], int] = {}
        for _, x, y in rows:
            joint[(x, y)] = joint.get((x, y), 0) + 1
        px: dict[str, float] = {}
        py: dict[str, float] = {}
        for (x, y), c in joint.items():
            px[x] = px.get(x, 0) + c / n
            py[y] = py.get(y, 0) + c / n
        mi = sum(
            c / n * math.log2((c / n) / (px[x] * py[y]))
            for (x, y), c in joint.items()
        )
        hx = -sum(p * math.log2(p) for p in px.values())
        hy = -sum(p * math.log2(p) for p in py.values())
        assert got["n_rows"] == n, trial
        assert abs(got["mi"] - max(0.0, mi)) < 1e-6, trial
        assert abs(got["h_x"] - hx) < 1e-6 and abs(got["h_y"] - hy) < 1e-6, trial


def test_mutual_info_bound_in_suite(spark):
    """MutualInfoBound as a table constraint: the determined part
    FAILs hi=0.5, the independent part PASSes, a constant-side part
    is NOT_READY, and a part absent from the profile (x entirely
    NULL) gets PASS from the shared grid fill."""
    from bigdime_spark.operators.stats import MutualInfoBound
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.schema import FAIL, NOT_READY, PASS

    rows = []
    k = 0
    # p0: x determines y (mi_norm = 1)
    for x, y in (("a", "A"), ("b", "B")):
        for _ in range(4):
            rows.append(("p0", f"i{k}", x, y)); k += 1
    # p1: product distribution (mi_norm = 0)
    for x in ("a", "b"):
        for y in ("A", "B"):
            for _ in range(3):
                rows.append(("p1", f"i{k}", x, y)); k += 1
    # p2: y constant → mi_norm undefined
    for x in ("a", "b"):
        rows.append(("p2", f"i{k}", x, "K")); k += 1
    # p3: x entirely NULL → no profile row
    rows += [("p3", f"i{k}", None, "A")]
    df = spark.createDataFrame(rows, "part string, image_id string, x string, y string")

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
        extra_table_constraints=[MutualInfoBound("x", "y", lo=0.0, hi=0.5)],
    )
    res = suite.run(spark, df, run_id="mi-bound")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "mutual_info.x~y"
        ).collect()
    }
    assert v == {"p0": FAIL, "p1": PASS, "p2": NOT_READY, "p3": PASS}
    res.release()


def test_mutual_info_bounds_config_section(spark):
    from bigdime_spark.operators.stats import MutualInfoBound
    from bigdime_spark.plans.config import suite_from_config

    suite = suite_from_config(
        {"mutual_info_bounds": [{"x": "fmt", "y": "caption", "hi": 0.9}]}
    )
    (tc,) = suite.extra_table_constraints
    assert isinstance(tc, MutualInfoBound)
    assert tc.name == "mutual_info.fmt~caption"
    assert (tc.lo, tc.hi) == (0.0, 0.9)
