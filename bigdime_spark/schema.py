"""Declared schemas + the schema validators (SURVEY.md §2 B14).

The reference keeps a declared schema in an external metadata store
(Metasegment→Entitee→Attribute) and validates the landed Hive table
against it with ColumnCount / ColumnType / ColumnOrder validators
(BASELINE.json:6 "column-type ... validators"; upstream module
``bigdime-data-validation``, source unavailable — SURVEY.md §0).
Here the declared schema is a ``StructType`` and validation is a
driver-side structural diff — no Spark job is needed or run.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

#: image+caption table schema, fixed verbatim by BASELINE.json:15 (input_hint)
IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

#: partition column (Iceberg identity partition; unit of verdicts/lineage/resume)
PART_COL = "part"

IMAGE_SCHEMA_PARTITIONED = T.StructType(
    list(IMAGE_SCHEMA.fields) + [T.StructField(PART_COL, T.StringType(), False)]
)

#: non-binary columns — the stats pass must never touch `bytes` (SURVEY B0b)
STATS_COLUMNS = ["image_id", "w", "h", "fmt", "caption", "phash"]

#: manifest = the "expected" side of RecordCount/Checksum validators,
#: playing the role of the reference's source-side event headers
#: (record count / checksum stamped by the source handler).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("part", T.StringType(), False),
        T.StructField("expected_rows", T.LongType(), True),
        T.StructField("expected_xor", T.LongType(), True),
        T.StructField("expected_sum", T.DecimalType(38, 0), True),
    ]
)

#: common violations schema (SURVEY B24; BASELINE.json:6 "one row per
#: failed constraint with partition lineage")
VIOLATION_SCHEMA = T.StructType(
    [
        T.StructField("constraint", T.StringType(), False),
        T.StructField("part", T.StringType(), True),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("column", T.StringType(), True),
        T.StructField("detail", T.StringType(), True),
        T.StructField("snapshot", T.StringType(), True),
    ]
)

#: verdict rows, one per (part × constraint) — verdict enum mirrors the
#: reference's ValidationResult {PASSED, FAILED, INCOMPLETE_SETUP, NOT_READY}
VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("part", T.StringType(), False),
        T.StructField("constraint", T.StringType(), False),
        T.StructField("verdict", T.StringType(), False),
        T.StructField("observed", T.StringType(), True),
        T.StructField("expected", T.StringType(), True),
    ]
)

PASS = "PASS"
FAIL = "FAIL"
SKIPPED_CONFIG = "SKIPPED_CONFIG"  # reference: INCOMPLETE_SETUP
NOT_READY = "NOT_READY"

#: lineage/metrics table (SURVEY B26; BASELINE.json:6,14 — per-partition
#: rows-scanned / violations / wall-time, resume skip-list)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # VALIDATED | FAILED
        T.StructField("rows_scanned", T.LongType(), True),
        T.StructField("violations", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
    ]
)


@dataclass(frozen=True)
class SchemaViolation:
    kind: str  # column_count | column_missing | column_extra | column_type | column_order | nullability
    column: str
    detail: str


def diff_schema(
    declared: T.StructType,
    actual: T.StructType,
    check_order: bool = True,
    check_nullability: bool = False,
) -> list[SchemaViolation]:
    """ColumnCount + ColumnType + ColumnOrder validators as one diff.

    Pure driver-side: compares ``df.schema`` against the declared
    StructType, returns one violation per mismatch (SURVEY B14).

    ``check_nullability`` is opt-in because Spark's parquet reader
    reports every column nullable regardless of writer metadata — a
    NOT-NULL diff against a parquet-backed DataFrame is always a
    false positive (observed; the actual null *content* check is the
    not_null validator's job, which is data- not metadata-based).
    """
    out: list[SchemaViolation] = []
    dec = {f.name: (i, f) for i, f in enumerate(declared.fields)}
    act = {f.name: (i, f) for i, f in enumerate(actual.fields)}
    if len(declared.fields) != len(actual.fields):
        out.append(
            SchemaViolation(
                "column_count",
                "*",
                f"declared {len(declared.fields)} columns, actual {len(actual.fields)}",
            )
        )
    for name, (i, f) in dec.items():
        if name not in act:
            out.append(SchemaViolation("column_missing", name, "declared column absent"))
            continue
        j, g = act[name]
        if f.dataType != g.dataType:
            out.append(
                SchemaViolation(
                    "column_type",
                    name,
                    f"declared {f.dataType.simpleString()}, actual {g.dataType.simpleString()}",
                )
            )
        if check_order and i != j:
            out.append(
                SchemaViolation("column_order", name, f"declared ordinal {i}, actual {j}")
            )
        if check_nullability and not f.nullable and g.nullable:
            out.append(
                SchemaViolation("nullability", name, "declared NOT NULL, actual nullable")
            )
    for name in act:
        if name not in dec:
            out.append(SchemaViolation("column_extra", name, "column not in declared schema"))
    return out
