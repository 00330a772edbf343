"""Type-inference profile (operators/stats.type_inference_profile):
each value class counts exactly, inference picks the NARROWEST fully-
conforming class, integral strings never leak into the temporal
classes, and timestamp strings don't collapse a column to 'date'.
"""

from __future__ import annotations

from bigdime_spark.operators.stats import type_inference_profile


def _profile(spark, values, part=None):
    rows = [(v,) for v in values]
    df = spark.createDataFrame(rows, "c string")
    out = type_inference_profile(df, ["c"], part_col=part)
    (r,) = out.collect()
    return r


def test_pure_classes_infer_narrowest(spark):
    cases = [
        (["1", "42", "-7", " 5 "], "bigint"),
        (["1.5", "2", "-0.25", "nan", "inf"], "double"),
        (["true", "false", "T", "f"], "boolean"),
        (["2024-01-15", "1999-12-31"], "date"),
        (["2024-01-15 10:30:00", "2024-01-15"], "timestamp"),
        (["abc", "1", "2024-01-15"], "string"),
        ([None, None], "empty"),
    ]
    for values, want in cases:
        r = _profile(spark, values)
        assert r["inferred"] == want, (values, want, dict(r.asDict()))


def test_integral_strings_are_numbers_not_dates(spark):
    """'2024' and '12345' date-cast in Spark (year shorthand) but must
    count as bigint/double only — the temporal classes exclude
    integral strings by design."""
    r = _profile(spark, ["2024", "12345"])
    assert r["n_bigint"] == 2
    assert r["n_date"] == 0 and r["n_timestamp"] == 0
    assert r["inferred"] == "bigint"


def test_timestamp_strings_do_not_infer_date(spark):
    """A timestamp string date-casts by truncation; the date class
    requires a date-SHAPED value, so a pure-timestamp column infers
    timestamp, not date."""
    r = _profile(spark, ["2024-01-15 10:30:00", "2024-01-16 00:00:00"])
    assert r["n_date"] == 0
    assert r["n_timestamp"] == 2
    assert r["inferred"] == "timestamp"


def test_counts_and_nulls_exact(spark):
    r = _profile(spark, ["1", "x", None, "2.5", None])
    assert r["n_rows"] == 5 and r["n_null"] == 2
    assert r["n_bigint"] == 1  # '1'
    assert r["n_double"] == 2  # '1', '2.5'
    assert r["n_boolean"] == 1  # '1'
    assert r["inferred"] == "string"  # 'x' conforms to nothing


def test_per_part_and_multi_column(spark):
    rows = [
        ("p0", "1", "2024-01-01"),
        ("p0", "2", "2024-01-02"),
        ("p1", "x", None),
    ]
    df = spark.createDataFrame(rows, "part string, a string, b string")
    out = type_inference_profile(df, ["a", "b"], part_col="part")
    got = {
        (r["part"], r["column"]): r["inferred"] for r in out.collect()
    }
    assert got == {
        ("p0", "a"): "bigint",
        ("p0", "b"): "date",
        ("p1", "a"): "string",
        ("p1", "b"): "empty",
    }
