"""Custom stateful streaming operator: per-partition RUNNING
record-count + order-insensitive checksum via
``applyInPandasWithState`` (the Structured-Streaming analogue of the
reference's per-input-unit RuntimeInfo accumulation — each arriving
micro-batch folds into the partition's running totals instead of
re-reading everything landed so far).

Design for scale:

- state is BOUNDED: exactly one (rows, xor, sum) triple per partition
  key — never per row — so 10^12 rows stream through O(#parts) state;
- the per-row digest is computed JVM-side (``xxhash64`` column,
  whole-stage codegen) BEFORE the groupBy, so the Python side only
  folds 64-bit integers over Arrow batches — no bytes cross the
  boundary;
- both reducers are commutative (XOR + exact SUM), so batch
  boundaries and arrival order cannot change the final state;
- the running sum is EXACT: state carries it as a decimal string
  folded with unbounded python ints, the same ring as the batch
  validators' ``sum(hash::decimal(38,0))`` (functions/hashes
  .checksum_agg_exprs) — at 10^12 rows the exact sum exceeds int64,
  so a wrapping fold would spuriously FAIL against the manifest;
- ``streaming_verdicts`` joins the drained totals against the same
  manifest the batch suite uses and emits IDENTICAL
  PASS/FAIL/SKIPPED_CONFIG rows to the batch RecordCount/Checksum
  validators (asserted in tests against a ValidationSuite run on the
  same input).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigdime_spark.functions.hashes import (
    CHECKSUM_COLUMNS,
    U64_MASK as _MASK,
    row_checksum_col,
    to_signed64 as _to_signed,
)
from bigdime_spark.schema import FAIL, PASS, SKIPPED_CONFIG


#: STATE/OUTPUT SCHEMA v2 (round 3): the running sum moved from a
#: wrapping int64 to an exact decimal STRING. Streaming checkpoints
#: and append-mode totals sinks written by the v1 (long) schema are
#: NOT compatible — Spark's state store rejects the changed state
#: schema, and a sink dir mixing long/string checksum_sum files fails
#: schema merge on read. Drain v1 checkpoints with the v1 build, or
#: start a fresh checkpoint_dir + out_dir (the stream re-reads the
#: source from scratch; totals are reproducible).
OUTPUT_DDL = (
    "part string, rows_total long, checksum_xor long, checksum_sum string"
)
STATE_DDL = "rows long, x long, s string"




def _fold_part(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        rows, x, s_str = state.get
        x &= _MASK
        s = int(s_str)  # exact running sum (unbounded python int)
    else:
        rows, x, s = 0, 0, 0
    import numpy as np

    for pdf in batches:
        h = pdf["_h"].to_numpy().astype("uint64")
        if len(h) == 0:
            continue
        rows += len(h)
        x ^= int(np.bitwise_xor.reduce(h))
        # exact signed sum: reinterpret the uint64 views back to
        # int64 and fold in python-int space (np sums would wrap)
        s += int(h.astype("int64").sum(dtype=object))
    state.update((rows, _to_signed(x), str(s)))
    yield pd.DataFrame(
        {
            "part": [key[0]],
            "rows_total": [rows],
            "checksum_xor": [_to_signed(x)],
            "checksum_sum": [str(s)],
        }
    )


def running_part_checksums(
    stream: DataFrame,
    columns: list[str] | None = None,
    output_mode: str = "append",
) -> DataFrame:
    """Streaming per-partition running totals → one updated row per
    part per micro-batch: (part, rows_total, checksum_xor,
    checksum_sum). ``checksum_sum`` is an exact decimal string (see
    module docstring). ``output_mode`` must match the sink's (parquet
    sinks are append-only; each batch appends the part's NEW running
    total — the last row per part is the current state)."""
    hashed = stream.withColumn("_h", row_checksum_col(columns or CHECKSUM_COLUMNS))
    return (
        hashed.select("part", "_h")
        .groupBy("part")
        .applyInPandasWithState(
            _fold_part,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_totals(totals: DataFrame) -> DataFrame:
    """Collapse an append-mode totals sink to the CURRENT state: the
    max-rows_total row per part (running totals only grow; ties break
    on the larger checksum_sum, which is identical data anyway)."""
    w = Window.partitionBy("part").orderBy(
        F.desc("rows_total"), F.desc("checksum_sum")
    )
    return (
        totals.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_verdicts(totals: DataFrame, manifest: DataFrame | None) -> DataFrame:
    """The manifest join promised by the module docstring: turn a
    drained totals sink (append-mode output of
    ``running_part_checksums``) into the SAME per-(part × constraint)
    verdict rows the batch RecordCount (B12) and Checksum (B13)
    validators emit — (part, constraint, verdict, observed, expected)
    with verdict ∈ {PASS, FAIL, SKIPPED_CONFIG}.

    The manifest is broadcast (one row per part); parts absent from it
    are SKIPPED_CONFIG, mirroring the reference's setup-incomplete
    outcome. The exact streaming sum (decimal string) is compared in
    decimal(38,0) — the identical ring to the batch validators."""
    cur = latest_totals(totals)
    if manifest is not None:
        cur = cur.join(F.broadcast(manifest), "part", "left")
    else:
        for col in ("expected_rows", "expected_xor", "expected_sum"):
            cur = cur.withColumn(col, F.lit(None))
    sum_dec = F.col("checksum_sum").cast("decimal(38,0)")
    rc = cur.select(
        "part",
        F.lit("record_count").alias("constraint"),
        F.when(F.col("expected_rows").isNull(), F.lit(SKIPPED_CONFIG))
        .when(F.col("rows_total") == F.col("expected_rows"), F.lit(PASS))
        .otherwise(F.lit(FAIL))
        .alias("verdict"),
        F.col("rows_total").cast("string").alias("observed"),
        F.col("expected_rows").cast("string").alias("expected"),
    )
    cs = cur.select(
        "part",
        F.lit("checksum").alias("constraint"),
        F.when(F.col("expected_xor").isNull(), F.lit(SKIPPED_CONFIG))
        .when(
            (F.col("checksum_xor") == F.col("expected_xor"))
            & (sum_dec == F.col("expected_sum")),
            F.lit(PASS),
        )
        .otherwise(F.lit(FAIL))
        .alias("verdict"),
        F.concat_ws(
            "/", F.col("checksum_xor").cast("string"), sum_dec.cast("string")
        ).alias("observed"),
        F.concat_ws(
            "/", F.col("expected_xor").cast("string"), F.col("expected_sum").cast("string")
        ).alias("expected"),
    )
    return rc.unionByName(cs)


def run_to_completion(
    spark, source_dir: str, schema, checkpoint_dir: str, out_dir: str,
    columns: list[str] | None = None,
) -> None:
    """Drain a directory-shaped stream with Trigger.AvailableNow,
    appending each micro-batch's updated running totals to parquet.
    The LAST row per part in the output is the stream's final state."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    totals = running_part_checksums(stream, columns)
    q = (
        totals.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
