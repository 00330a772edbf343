"""applyInPandasWithState running checksums: batch-order independence
(commutative XOR/SUM folds), bounded per-part state, and resume via
the streaming checkpoint (a second drain re-reads nothing)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from bigdime_spark.functions.hashes import row_checksum_col
from bigdime_spark.schema import IMAGE_SCHEMA_PARTITIONED
from bigdime_spark.sources.synth import build_fixture
from bigdime_spark.streaming import stateful

_MASK = (1 << 64) - 1


def _expected_totals(df):
    """Driver-side fold of the same per-row digests (exact oracle)."""
    rows = df.select("part", row_checksum_col().alias("_h")).collect()
    out: dict[str, list[int]] = {}
    for r in rows:
        out.setdefault(r["part"], []).append(r["_h"])
    exp = {}
    for part, hs in out.items():
        x, s = 0, 0
        for h in hs:
            x ^= h & _MASK
            s = (s + (h & _MASK)) & _MASK
        exp[part] = (len(hs), stateful._to_signed(x), stateful._to_signed(s))
    return exp


def _final_rows(spark, out_dir):
    files = glob.glob(f"{out_dir}/*.parquet")
    assert files
    df = spark.read.parquet(out_dir)
    # last update per part = the max rows_total row (totals only grow)
    w_rows = (
        df.groupBy("part")
        .agg(F.max("rows_total").alias("rows_total"))
        .join(df, ["part", "rows_total"])
    )
    return {
        r["part"]: (r["rows_total"], r["checksum_xor"], r["checksum_sum"])
        for r in w_rows.collect()
    }


def test_running_checksums_match_batch_fold(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    fx = build_fixture(spark, n_rows=120, n_parts=4)
    # two separate appends → at least two files, arrival split
    first = fx.raw.filter(F.col("image_id") < "img-000000000060")
    second = fx.raw.filter(F.col("image_id") >= "img-000000000060")
    first.repartition(2).write.mode("append").parquet(src)

    stateful.run_to_completion(spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out)
    mid = _final_rows(spark, out)
    assert sum(v[0] for v in mid.values()) == first.count()

    second.repartition(3).write.mode("append").parquet(src)
    stateful.run_to_completion(spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out)

    final = _final_rows(spark, out)
    assert final == _expected_totals(fx.raw)


def test_second_drain_without_new_files_is_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    fx = build_fixture(spark, n_rows=40, n_parts=2)
    fx.raw.write.mode("append").parquet(src)

    stateful.run_to_completion(spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out)
    n1 = spark.read.parquet(out).count()
    # checkpoint resume: nothing new → no new output rows
    stateful.run_to_completion(spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1
