"""CategoricalBound (deequ hasEntropy family): declared [lo, hi]
bounds on a categorical column's entropy / mode mass / distinct count
per part, riding categorical_profile's exact value distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.stats import CategoricalBound
from bigdime_spark.plans.config import suite_from_config
from bigdime_spark.plans.suite import StatsProfile, ValidationSuite
from bigdime_spark.schema import FAIL, NOT_READY, PASS


def _suite(df, bounds):
    return ValidationSuite(
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
        extra_table_constraints=bounds,
    )


def test_entropy_collapse_fails_balanced_passes(spark):
    """p0 holds a balanced 2-value mix (entropy 1.0 → PASS at
    lo=0.5); p1 collapsed to one value (entropy 0.0 → FAIL); p2 has
    only NULLs (→ NOT_READY via the partial-verdict grid)."""
    rows = [("p0", "a" if i % 2 else "b") for i in range(8)]
    rows += [("p1", "a")] * 8
    rows += [("p2", None)] * 4
    df = spark.createDataFrame(rows, "part string, fmt string").withColumn(
        "image_id",
        F.concat(F.lit("i"), F.monotonically_increasing_id().cast("string")),
    )
    suite = _suite(df, [CategoricalBound("fmt", metric="entropy", lo=0.5)])
    res = suite.run(spark, df, run_id="cat-entropy")
    v = {
        r["part"]: (r["verdict"], r["observed"])
        for r in res.verdicts.filter(
            F.col("constraint") == "categorical_entropy.fmt"
        ).collect()
    }
    assert v["p0"][0] == PASS and v["p0"][1] == "entropy=1.0"
    assert v["p1"][0] == FAIL and v["p1"][1] == "entropy=0.0"
    assert v["p2"][0] == NOT_READY
    res.release()


def test_top_frac_and_n_distinct_metrics(spark):
    rows = [("p0", "a")] * 9 + [("p0", "b")]          # mode mass 0.9
    rows += [("p1", v) for v in ("a", "b", "c", "d")]  # 4 distinct
    df = spark.createDataFrame(rows, "part string, fmt string").withColumn(
        "image_id", F.concat(F.lit("i"), F.monotonically_increasing_id().cast("string"))
    )
    suite = _suite(
        df,
        [
            CategoricalBound("fmt", metric="top_frac", hi=0.8),
            CategoricalBound("fmt", metric="n_distinct", lo=1, hi=3),
        ],
    )
    res = suite.run(spark, df, run_id="cat-mode")
    v = {
        (r["part"], r["constraint"]): r["verdict"]
        for r in res.verdicts.filter(
            F.col("constraint").startswith("categorical_")
        ).collect()
    }
    assert v[("p0", "categorical_top_frac.fmt")] == FAIL
    assert v[("p1", "categorical_top_frac.fmt")] == PASS
    assert v[("p0", "categorical_n_distinct.fmt")] == PASS
    assert v[("p1", "categorical_n_distinct.fmt")] == FAIL
    res.release()


def test_constructor_refusals():
    with pytest.raises(ValueError, match="unsupported"):
        CategoricalBound("fmt", metric="mode")
    with pytest.raises(ValueError, match="hi"):
        CategoricalBound("fmt", lo=2.0, hi=1.0)


def test_config_section(spark):
    suite = suite_from_config(
        {
            "categorical_bounds": [
                {"column": "fmt", "metric": "entropy", "lo": 0.5},
                {"column": "fmt", "metric": "top_frac", "hi": 0.8},
            ]
        }
    )
    bounds = [
        c for c in suite.extra_table_constraints
        if isinstance(c, CategoricalBound)
    ]
    assert [b.name for b in bounds] == [
        "categorical_entropy.fmt", "categorical_top_frac.fmt",
    ]
    assert bounds[0].hi == float("inf")
    with pytest.raises(ValueError, match="unsupported"):
        suite_from_config(
            {"categorical_bounds": [{"column": "fmt", "metric": "bogus"}]}
        )
    with pytest.raises(ValueError, match="missing required keys"):
        suite_from_config({"categorical_bounds": [{"metric": "entropy"}]})
