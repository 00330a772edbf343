"""ColumnCount/ColumnType/ColumnOrder validator oracles (SURVEY B14,
FIXTURES F4 "schema PASS/FAIL"). Pure driver-side — no Spark session."""

from __future__ import annotations

from pyspark.sql import types as T

from bigdime_spark.schema import IMAGE_SCHEMA, diff_schema


def _kinds(violations):
    return sorted(v.kind for v in violations)


def test_identical_schema_passes():
    assert diff_schema(IMAGE_SCHEMA, IMAGE_SCHEMA) == []


def test_retyped_column():
    fields = [
        T.StructField(f.name, T.StringType() if f.name == "w" else f.dataType, f.nullable)
        for f in IMAGE_SCHEMA.fields
    ]
    out = diff_schema(IMAGE_SCHEMA, T.StructType(fields))
    assert _kinds(out) == ["column_type"]
    assert out[0].column == "w"


def test_dropped_column_is_count_plus_missing():
    actual = T.StructType([f for f in IMAGE_SCHEMA.fields if f.name != "phash"])
    out = diff_schema(IMAGE_SCHEMA, actual)
    assert "column_count" in _kinds(out) and "column_missing" in _kinds(out)


def test_reordered_columns():
    fields = list(IMAGE_SCHEMA.fields)
    fields[0], fields[1] = fields[1], fields[0]
    out = diff_schema(IMAGE_SCHEMA, T.StructType(fields))
    assert _kinds(out) == ["column_order", "column_order"]


def test_extra_column_and_nullability():
    fields = [
        T.StructField(f.name, f.dataType, True)  # image_id declared NOT NULL
        for f in IMAGE_SCHEMA.fields
    ] + [T.StructField("extra", T.StringType(), True)]
    out = diff_schema(IMAGE_SCHEMA, T.StructType(fields), check_nullability=True)
    assert "column_extra" in _kinds(out) and "nullability" in _kinds(out)
    # default: nullability not checked (parquet scans always report nullable)
    out2 = diff_schema(IMAGE_SCHEMA, T.StructType(fields))
    assert "nullability" not in _kinds(out2)
