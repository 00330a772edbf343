"""Benford first-digit profile (C46) — digit extraction, eligibility
exclusions, grid fill, per-part mode, undefined-group convention, and
the MAD summary's conformity ordering (a by-construction Benford
column scores near 0; a single-digit constant column scores huge)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdime_spark.operators.stats import (
    benford_mad,
    benford_profile,
    first_digit_col,
)


def _profile_map(rows):
    return {(r["column"], r["digit"]): r for r in rows}


def test_first_digit_known_values(spark):
    vals = [
        (1.0, 1),
        (19.5, 1),
        (0.00234, 2),
        (999999.0, 9),
        (1000.0, 1),
        (0.5, 5),
        (3e8, 3),
        (7.0, 7),
    ]
    df = spark.createDataFrame([(v,) for v, _ in vals], "x double")
    got = df.select(F.col("x"), first_digit_col(F.col("x")).alias("d")).collect()
    want = dict(vals)
    for r in got:
        assert r["d"] == want[r["x"]], r


def test_ineligible_values_yield_null_digit(spark):
    df = spark.createDataFrame(
        [(None,), (0.0,), (-5.0,), (float("nan"),), (float("inf",),)],
        "x double",
    )
    got = df.select(first_digit_col(F.col("x")).alias("d")).collect()
    assert all(r["d"] is None for r in got)


def test_profile_grid_fill_and_exact_counts(spark):
    # only digits 1 and 2 present; the other seven digits must still
    # appear as explicit zero rows
    df = spark.createDataFrame(
        [(1.0,), (15.0,), (0.12,), (2.5,), (None,), (-3.0,)], "x double"
    )
    rows = benford_profile(df, ["x"]).collect()
    assert len(rows) == 9
    m = _profile_map(rows)
    assert m[("x", 1)]["n"] == 3 and m[("x", 2)]["n"] == 1
    for d in range(3, 10):
        assert m[("x", d)]["n"] == 0
    assert all(r["n_eligible"] == 4 for r in rows)
    assert m[("x", 1)]["frac"] == 0.75
    # benford expectation column carries the law itself
    assert abs(m[("x", 1)]["benford"] - math.log10(2.0)) < 1e-9


def test_profile_per_part_and_undefined_group(spark):
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 55.0), ("b", None), ("b", 0.0)],
        "part string, x double",
    )
    rows = benford_profile(df, ["x"], part_col="part").collect()
    assert len(rows) == 18  # 2 parts x 9 digits, all-ineligible part kept
    by_part = {}
    for r in rows:
        by_part.setdefault(r["part"], []).append(r)
    a = {r["digit"]: r for r in by_part["a"]}
    assert a[5]["n"] == 2 and a[5]["frac"] == 1.0
    for r in by_part["b"]:
        assert r["n_eligible"] == 0 and r["frac"] is None and r["dev"] is None


def test_benford_law_on_log_uniform_column(spark):
    # 10^(3m/1000) over m=0..999 is log-uniform across three decades —
    # Benford by construction; every digit's frac must sit within one
    # part-per-hundred of log10(1 + 1/d)
    df = spark.range(1000).select(
        F.pow(F.lit(10.0), F.col("id").cast("double") / 1000.0 * 3.0).alias("x")
    )
    rows = benford_profile(df, ["x"]).collect()
    assert all(r["dev"] < 0.01 for r in rows)
    mad = benford_mad(benford_profile(df, ["x"])).collect()[0]
    assert mad["mad"] < 0.006  # Nigrini "close conformity"


def test_benford_mad_orders_conformity(spark):
    # a constant-first-digit column is maximal nonconformity; MAD must
    # rank it far above the log-uniform column, and an all-null column
    # stays NULL (undefined, never a silent 0)
    df = spark.range(1000).select(
        F.pow(F.lit(10.0), F.col("id").cast("double") / 1000.0 * 3.0).alias("good"),
        (F.lit(7000.0) + F.col("id")).alias("flat"),  # all start with 7
        F.lit(None).cast("double").alias("dead"),
    )
    rows = benford_mad(benford_profile(df, ["good", "flat", "dead"])).collect()
    m = {r["column"]: r for r in rows}
    assert m["dead"]["mad"] is None and m["dead"]["n_eligible"] == 0
    assert m["flat"]["mad"] > 0.15  # 1.0 vs 0.058 on digit 7 alone
    assert m["good"]["mad"] < 0.006 < m["flat"]["mad"]


def test_benford_bound_in_suite(spark):
    """BenfordBound verdicts: a log-uniform part PASSes, a
    constant-first-digit part FAILs, a part below min_eligible is
    NOT_READY (MAD over a handful of rows is noise, not evidence)."""
    import pytest

    from bigdime_spark.operators.stats import BenfordBound
    from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
    from bigdime_spark.schema import FAIL, NOT_READY, PASS

    rows = (
        [("p0", "a%d" % k, 10.0 ** (k / 200.0 * 3.0)) for k in range(200)]
        + [("p1", "b%d" % k, 7000.0 + k) for k in range(200)]
        + [("p2", "c%d" % k, 10.0 ** (k / 10.0)) for k in range(10)]
    )
    df = spark.createDataFrame(rows, "part string, image_id string, sz double")
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
        extra_table_constraints=[
            BenfordBound("sz", max_mad=0.02, min_eligible=100)
        ],
    )
    res = suite.run(spark, df, run_id="benford-bound")
    v = {
        r["part"]: r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint") == "benford.sz"
        ).collect()
    }
    assert v == {"p0": PASS, "p1": FAIL, "p2": NOT_READY}
    res.release()

    with pytest.raises(ValueError, match="max_mad"):
        BenfordBound("sz", max_mad=0.0)
    with pytest.raises(ValueError, match="min_eligible"):
        BenfordBound("sz", min_eligible=0)


def test_benford_bounds_config_section(spark):
    import pytest

    from bigdime_spark.operators.stats import BenfordBound
    from bigdime_spark.plans.config import suite_from_config

    suite = suite_from_config(
        {"benford_bounds": [{"column": "bytes_len", "max_mad": 0.05}]}
    )
    (tc,) = suite.extra_table_constraints
    assert isinstance(tc, BenfordBound)
    assert tc.name == "benford.bytes_len"
    assert (tc.max_mad, tc.min_eligible) == (0.05, 100)

    with pytest.raises(ValueError, match="benford_bounds"):
        suite_from_config({"benford_bounds": [{"column": "x", "max_mad": -1}]})
    with pytest.raises(ValueError, match="benford_bounds"):
        suite_from_config({"benford_bounds": [{"col": "x"}]})


def test_benford_shift_across_snapshots(spark):
    """Cross-snapshot MAD drift: the part whose curated column was
    flattened to a constant first digit moves, the untouched part
    stays ~0, and a side that went all-null surfaces as a NULL shift
    (full outer), never a dropped row."""
    from bigdime_spark.operators.stats import benford_shift

    raw_rows = [
        ("p0", 10.0 ** (k / 100.0 * 3.0)) for k in range(100)
    ] + [("p1", 10.0 ** (k / 100.0 * 3.0)) for k in range(100)] + [
        ("p2", 10.0 ** (k / 50.0)) for k in range(50)
    ]
    cur_rows = (
        [("p0", 10.0 ** (k / 100.0 * 3.0)) for k in range(100)]  # unchanged
        + [("p1", 7000.0 + k) for k in range(100)]  # flattened: digit 7
        + [("p2", None)] * 50  # collapsed to null
    )
    raw = spark.createDataFrame(raw_rows, "part string, x double")
    cur = spark.createDataFrame(cur_rows, "part string, x double")
    got = {r["part"]: r for r in benford_shift(raw, cur, ["x"]).collect()}
    assert len(got) == 3
    assert got["p0"]["mad_shift"] < 0.002
    assert got["p1"]["mad_shift"] > 0.12
    assert got["p2"]["mad_cur"] is None and got["p2"]["mad_shift"] is None


def test_cli_profile_benford(spark, tmp_path):
    import json

    from bigdime_spark import cli

    df = spark.range(200).select(
        F.concat(F.lit("p"), (F.col("id") % 2).cast("string")).alias("part"),
        F.pow(F.lit(10.0), F.col("id").cast("double") / 200.0 * 3.0).alias("sz"),
    )
    src = str(tmp_path / "tbl")
    df.write.parquet(src)
    out = str(tmp_path / "prof")
    rc = cli.main(
        ["profile", "--input", src, "--benford", "sz", "--out", out,
         "--master", "local[2]"]
    )
    assert rc == 0
    import duckdb

    mad = duckdb.sql(
        f"select part, mad from read_parquet('{out}/benford_mad/*.parquet') order by 1"
    ).fetchall()
    assert len(mad) == 2 and all(m < 0.02 for _, m in mad)
    prof = duckdb.sql(
        f"select count(*) from read_parquet('{out}/benford/*.parquet')"
    ).fetchone()[0]
    assert prof == 18  # 2 parts x 9 digits, grid-filled
