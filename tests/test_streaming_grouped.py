"""Streaming grouped metrics (C74, streaming/stateful): the bounded
per-(part, group) accumulation must equal the batch C72 profile
exactly on every exact field, be batch-split invariant, share the
GroupedBound verdict fold bit-for-bit, and surface through the stream
CLI with the C73 trend-ready output."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.grouped import GroupedBound, grouped_metrics
from bigdime_spark.schema import IMAGE_SCHEMA_PARTITIONED
from bigdime_spark.sources.synth import build_fixture
from bigdime_spark.streaming.stateful import (
    latest_grouped,
    run_grouped_to_completion,
)


def _dirty_raw(spark, n_rows=160, n_parts=2, seed=5):
    fx = build_fixture(spark, n_rows=n_rows, n_parts=n_parts, seed=seed)
    return fx.raw.withColumn(
        "caption",
        F.when(F.col("fmt") == "pngz", F.lit(None).cast("string")).otherwise(
            F.col("caption")
        ),
    ).withColumn(
        # a NULL group segment: some rows lose their fmt entirely
        "fmt",
        F.when(F.xxhash64("image_id") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("fmt")),
    )


def _exact(rows):
    return {
        (r["part"], r["group"]): (
            r["n"], r["n_null"], r["null_rate"], r["min"], r["max"]
        )
        for r in rows
    }


def test_streamed_profile_equals_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sgm")
    raw = _dirty_raw(spark)
    half = raw.filter(F.xxhash64("image_id") % 2 == 0)
    other = raw.filter(F.xxhash64("image_id") % 2 != 0)
    half.coalesce(1).write.mode("append").parquet(f"{base}/src")
    other.coalesce(1).write.mode("append").parquet(f"{base}/src")
    run_grouped_to_completion(
        spark, f"{base}/src", IMAGE_SCHEMA_PARTITIONED,
        f"{base}/ckpt", f"{base}/sink", "w", "fmt",
    )
    streamed = latest_grouped(spark.read.parquet(f"{base}/sink")).collect()
    batch = grouped_metrics(raw, "w", "fmt").collect()
    assert _exact(streamed) == _exact(batch)
    # running-sum mean equals batch mean to float tolerance
    bm = {(r["part"], r["group"]): r["mean"] for r in batch}
    for r in streamed:
        assert r["mean"] == pytest.approx(bm[(r["part"], r["group"])], rel=1e-12)
    # the NULL group segment survived the key round-trip
    assert any(r["group"] is None for r in streamed)


def test_batch_split_invariance(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sgi")
    raw = _dirty_raw(spark, n_rows=96)
    raw.coalesce(1).write.parquet(f"{base}/one")
    for i in range(3):
        raw.filter(F.pmod(F.xxhash64("image_id"), 3) == i).coalesce(1).write.mode(
            "append"
        ).parquet(f"{base}/three")
    profs = []
    for src in ("one", "three"):
        run_grouped_to_completion(
            spark, f"{base}/{src}", IMAGE_SCHEMA_PARTITIONED,
            f"{base}/ckpt_{src}", f"{base}/sink_{src}", "caption", "fmt",
        )
        profs.append(
            latest_grouped(spark.read.parquet(f"{base}/sink_{src}")).collect()
        )
    assert _exact(profs[0]) == _exact(profs[1])


def test_verdict_parity_streamed_vs_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("sgv")
    raw = _dirty_raw(spark)
    raw.coalesce(1).write.parquet(f"{base}/src")
    run_grouped_to_completion(
        spark, f"{base}/src", IMAGE_SCHEMA_PARTITIONED,
        f"{base}/ckpt", f"{base}/sink", "caption", "fmt",
    )
    gb = GroupedBound("caption", "fmt", metric="null_rate", hi=0.1, min_support=3)
    streamed, _ = gb.verdicts_from_profile(
        latest_grouped(spark.read.parquet(f"{base}/sink"))
    )
    from bigdime_spark.operators.base import SuiteContext

    batch, _ = gb.run(SuiteContext(spark=spark, raw=raw))
    key = lambda rows: {  # noqa: E731
        r["part"]: (r["verdict"], r["observed"], r["expected"]) for r in rows
    }
    assert key(streamed.collect()) == key(batch.collect())
    # and the gate actually fails: pngz is fully nulled
    assert all(v[0] == "FAIL" for v in key(batch.collect()).values())


def test_stream_cli_grouped_bound_e2e(spark, tmp_path_factory, capsys):
    from bigdime_spark import cli

    base = tmp_path_factory.mktemp("sgc")
    _dirty_raw(spark).coalesce(1).write.parquet(f"{base}/src")
    rc = cli.main(
        ["stream", "--source", f"{base}/src", "--out", f"{base}/out",
         "--checkpoint", f"{base}/ckpt", "--run-id", "s1",
         "--grouped-bound", "caption:fmt:null_rate:~0.1:3"]
    )
    out = capsys.readouterr().out
    summary = json.loads(
        [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert rc == 1 and summary["grouped_fails"] == 2  # both parts page
    gv = spark.read.parquet(f"{base}/out/grouped_verdicts").collect()
    assert all("pngz" in r["observed"] for r in gv if r["verdict"] == "FAIL")
    # C73 trend-ready shape, run_id-stamped (trend hard-requires it)
    grouped = spark.read.parquet(f"{base}/out/grouped")
    assert {"part", "stat__caption__null_rate", "run_id"} <= set(grouped.columns)
    rows = grouped.collect()
    assert any("|fmt=pngz" in r["part"] for r in rows)
    assert all(r["run_id"] == "s1" for r in rows)

    # typo'd column → refused before any streaming query starts
    rc_bad = cli.main(
        ["stream", "--source", f"{base}/src", "--out", f"{base}/outx",
         "--checkpoint", f"{base}/ckptx",
         "--grouped-bound", "captoin:fmt:null_rate:~0.1"]
    )
    err = capsys.readouterr().err
    assert rc_bad == 2 and "captoin" in err

    # n_distinct needs unbounded state → refused before any query runs
    rc2 = cli.main(
        ["stream", "--source", f"{base}/src", "--out", f"{base}/out2",
         "--checkpoint", f"{base}/ckpt2",
         "--grouped-bound", "caption:fmt:n_distinct:1~"]
    )
    err = capsys.readouterr().err
    assert rc2 == 2 and "n_distinct" in err
