"""applyInPandasWithState running checksums: batch-order independence
(commutative XOR + EXACT SUM folds — the same decimal ring as the
batch validators), bounded per-part state, resume via the streaming
checkpoint, and streaming_verdicts == batch suite verdicts on the
same drained input."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bigdime_spark.functions.hashes import checksum_agg_exprs, row_checksum_col
from bigdime_spark.schema import IMAGE_SCHEMA_PARTITIONED
from bigdime_spark.sources.synth import build_fixture
from bigdime_spark.streaming import stateful


def _expected_totals(df):
    """The BATCH validators' own aggregates (checksum_agg_exprs) — the
    exact ring the stream state must match: xor int64, sum
    decimal(38,0) exact."""
    rows = (
        df.withColumn("_h", row_checksum_col())
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"), *checksum_agg_exprs("_h"))
        .collect()
    )
    return {r["part"]: (r["n"], r["actual_xor"], int(r["actual_sum"])) for r in rows}


def _final_rows(spark, out_dir):
    files = glob.glob(f"{out_dir}/*.parquet")
    assert files
    final = stateful.latest_totals(spark.read.parquet(out_dir))
    return {
        r["part"]: (r["rows_total"], r["checksum_xor"], int(r["checksum_sum"]))
        for r in final.collect()
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


def test_streaming_verdicts_equal_batch_suite(spark, tmp_path):
    """The round-2 verdict's missing piece: drain a stream, join the
    manifest, and get byte-identical record_count/checksum verdict
    rows to a batch ValidationSuite run on the same input — including
    a FAIL (count off by one on one part) and a SKIPPED_CONFIG (part
    absent from the manifest)."""
    from bigdime_spark.plans.suite import ValidationSuite
    from bigdime_spark.sources.synth import InjectionSpec

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    fx = build_fixture(
        spark,
        n_rows=160,
        n_parts=4,
        spec=InjectionSpec(
            count_mismatch=("p0001",), missing_manifest=("p0003",)
        ),
    )
    fx.raw.write.mode("append").parquet(src)

    stateful.run_to_completion(spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out)
    stream_v = stateful.streaming_verdicts(
        spark.read.parquet(out), fx.manifest
    )

    suite = ValidationSuite(
        check_uniqueness=False,
        check_referential=False,
        check_caption=False,
        check_drift=False,
        check_domains=False,
        not_null=(),
    )
    res = suite.run(spark, spark.read.parquet(src), manifest=fx.manifest, run_id="sv")
    batch_v = res.verdicts.filter(
        F.col("constraint").isin("record_count", "checksum")
    )

    got = {tuple(r) for r in stream_v.collect()}
    want = {tuple(r) for r in batch_v.collect()}
    assert got == want
    # the fixture really exercised all three outcomes
    verdicts = {r[2] for r in got}
    assert verdicts == {"PASS", "FAIL", "SKIPPED_CONFIG"}
    res.release()


# ------------------------------------------- cross-batch key uniqueness

KEYPART = "image_id string, part string"


def _drain_uniq(spark, src, ckpt, out):
    stateful.run_uniqueness_to_completion(
        spark, src, KEYPART, ckpt, out
    )


def test_cross_batch_duplicate_detected(spark, tmp_path):
    """The round-3 verdict gap: a key landing once per micro-batch is
    invisible to within-batch uniqueness — the stateful operator must
    flag it with first-seen attribution."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    b1 = spark.createDataFrame(
        [("dup-key", "p0"), ("ok-1", "p0"), ("ok-2", "p1")], KEYPART
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    _drain_uniq(spark, src, ckpt, out)
    # no duplicates yet → nothing emitted (sink may not even exist)
    import glob as _glob

    assert not any(
        spark.read.parquet(f).count()
        for f in _glob.glob(f"{out}/*.parquet")
    )

    b2 = spark.createDataFrame([("dup-key", "p1"), ("ok-3", "p2")], KEYPART)
    b2.coalesce(1).write.mode("append").parquet(src)
    _drain_uniq(spark, src, ckpt, out)

    rows = {r["image_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"dup-key"}
    r = rows["dup-key"]
    assert r["n_seen"] == 2
    assert r["first_part"] == "p0"
    assert r["parts_sample"] == "p0,p1"


def test_within_batch_duplicate_also_detected(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b = spark.createDataFrame(
        [("k", "p0"), ("k", "p0"), ("k", "p1"), ("solo", "p0")], KEYPART
    )
    b.coalesce(1).write.mode("append").parquet(src)
    _drain_uniq(spark, src, ckpt, out)
    rows = {r["image_id"]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"k"}
    assert rows["k"]["n_seen"] == 3
    assert rows["k"]["parts_sample"] == "p0,p1"


def test_streaming_uniqueness_verdict_shape(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b1 = spark.createDataFrame([("k", "p0")], KEYPART)
    b1.coalesce(1).write.mode("append").parquet(src)
    _drain_uniq(spark, src, ckpt, out)
    b2 = spark.createDataFrame([("k", "p1"), ("j", "p1"), ("j", "p1")], KEYPART)
    b2.coalesce(1).write.mode("append").parquet(src)
    _drain_uniq(spark, src, ckpt, out)

    verdicts = {
        (r["part"], r["constraint"]): r
        for r in stateful.streaming_uniqueness_verdicts(
            spark.read.parquet(out)
        ).collect()
    }
    assert set(verdicts) == {
        ("p0", "uniqueness.image_id"),
        ("p1", "uniqueness.image_id"),
    }
    assert verdicts[("p0", "uniqueness.image_id")]["observed"] == "dup_keys=1"  # k
    assert verdicts[("p1", "uniqueness.image_id")]["observed"] == "dup_keys=2"  # k + j
    assert all(v["verdict"] == "FAIL" for v in verdicts.values())


def test_uniqueness_resume_is_noop_without_new_files(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    b = spark.createDataFrame([("k", "p0"), ("k", "p1")], KEYPART)
    b.coalesce(1).write.mode("append").parquet(src)
    _drain_uniq(spark, src, ckpt, out)
    n1 = spark.read.parquet(out).count()
    _drain_uniq(spark, src, ckpt, out)
    assert spark.read.parquet(out).count() == n1 == 1


def test_uniqueness_invariant_to_batch_split(spark, tmp_path_factory):
    """Determinism under arrival batching (SURVEY §5.4 for C19): the
    SAME row multiset split into micro-batches at every possible point
    must yield identical final duplicate state — counts, first-seen
    part, and bounded parts sample."""
    rows = [
        ("a", "p0"), ("a", "p1"), ("b", "p2"), ("c", "p3"),
        ("a", "p4"), ("d", "p5"), ("b", "p6"),
    ]
    expected = {
        "a": (3, "p0", "p0,p1,p4"),
        "b": (2, "p2", "p2,p6"),
    }
    for split in (1, 2, 3, 5, 6):
        base = tmp_path_factory.mktemp(f"uniq-split{split}")
        src, out, ckpt = str(base / "src"), str(base / "out"), str(base / "ckpt")
        spark.createDataFrame(rows[:split], KEYPART).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _drain_uniq(spark, src, ckpt, out)
        spark.createDataFrame(rows[split:], KEYPART).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _drain_uniq(spark, src, ckpt, out)
        final = {
            r["image_id"]: (r["n_seen"], r["first_part"], r["parts_sample"])
            for r in stateful.latest_dupes(spark.read.parquet(out)).collect()
        }
        assert final == expected, f"split={split}: {final}"


def test_uniqueness_ttl_evicts_idle_keys(spark, tmp_path):
    """TTL semantics: a key idle past the TTL loses its state during
    the NEXT batch containing other data (Spark invokes timed-out
    groups only when a batch fires), so a later re-landing counts as
    first-seen — the documented state-size/recall trade."""
    import time as _time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        stateful.run_uniqueness_to_completion(
            spark, src, KEYPART, ckpt, out, ttl_ms=1000
        )

    spark.createDataFrame([("k", "p0")], KEYPART).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    _time.sleep(2)  # key k idles past the TTL
    spark.createDataFrame([("other", "p2")], KEYPART).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()  # this batch evicts k's state
    spark.createDataFrame([("k", "p1")], KEYPART).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()  # k re-lands as first-seen — NOT a duplicate

    import glob as _glob

    # read the DIRECTORY (the sink's _spark_metadata log filters any
    # file a stopped batch left uncommitted), not individual files
    emitted = (
        spark.read.parquet(out).count()
        if _glob.glob(f"{out}/*.parquet")
        else 0
    )
    assert emitted == 0


# ---------------------------------------- streaming drift histograms

def test_streamed_histograms_equal_batch_stats_and_drift(spark, tmp_path):
    """C18's streaming twin (round-4 verdict #5): histogram bucket
    counts accumulated per micro-batch must equal the batch
    histogram_frames arrays VALUE-EXACTLY, and drift_from_stats over
    (streamed stats of A, batch stats of B) must equal batch drift
    (batch stats of A, batch stats of B) row-for-row."""
    from bigdime_spark.operators.drift import DEFAULT_DRIFT_COLUMNS, drift_from_stats
    from bigdime_spark.operators.stats import histogram_frames

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    fx = build_fixture(spark, n_rows=160, n_parts=4, drift_parts=(1,))
    # two appends → two micro-batches; counts must be split-invariant
    first = fx.raw.filter(F.col("image_id") < "img-000000000080")
    second = fx.raw.filter(F.col("image_id") >= "img-000000000080")
    first.repartition(2).write.mode("append").parquet(src)
    stateful.run_histograms_to_completion(
        spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out
    )
    second.repartition(3).write.mode("append").parquet(src)
    stateful.run_histograms_to_completion(
        spark, src, IMAGE_SCHEMA_PARTITIONED, ckpt, out
    )

    streamed = stateful.latest_histograms(spark.read.parquet(out))
    specs = [(s.column, s.lo, s.hi, s.nbins) for s in DEFAULT_DRIFT_COLUMNS]
    batch = histogram_frames(fx.raw, specs)

    s_rows = {r["part"]: r for r in streamed.collect()}
    b_rows = {r["part"]: r for r in batch.collect()}
    assert set(s_rows) == set(b_rows)
    for part, br in b_rows.items():
        for s in DEFAULT_DRIFT_COLUMNS:
            assert (
                s_rows[part][f"stat__{s.column}__hist"]
                == br[f"stat__{s.column}__hist"]
            ), (part, s.column)
            assert (
                s_rows[part][f"stat__{s.column}__hist_spec"]
                == br[f"stat__{s.column}__hist_spec"]
            )

    # drift(streamed A, batch B) == drift(batch A, batch B) value-exact
    other = histogram_frames(fx.curated, specs)
    key = lambda r: (r["part"], r["column"])  # noqa: E731
    d_stream = {key(r): r for r in drift_from_stats(streamed, other).collect()}
    d_batch = {key(r): r for r in drift_from_stats(batch, other).collect()}
    assert set(d_stream) == set(d_batch)
    for k, br in d_batch.items():
        sr = d_stream[k]
        for fld in ("ks_d", "ks_threshold", "psi", "n", "m"):
            assert sr[fld] == br[fld], (k, fld, sr[fld], br[fld])

    # self-drift of the streamed stats is exactly zero
    zero = drift_from_stats(streamed, batch).collect()
    assert zero and all(r["ks_d"] == 0.0 and r["psi"] == 0.0 for r in zero)


def test_ttl_drain_catches_file_landing_mid_drain(spark, tmp_path):
    """Round-4 verdict #3 done-bar: a file landing WHILE the TTL-mode
    drain is quiescing must still be fully drained. The on_first_batch
    listener hook moves a pre-staged duplicate file into the source the
    instant the first batch commits — deterministically mid-drain —
    and the drain must then observe the new data batch (the listener
    records every commit; no polling gap) and keep going until it too
    is consumed."""
    import glob as _glob
    import shutil

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    staging = str(tmp_path / "staging")

    spark.createDataFrame([("k", "p0"), ("x", "p0")], KEYPART).coalesce(
        1
    ).write.mode("append").parquet(src)
    # the mid-drain landing: key k again, different part
    spark.createDataFrame([("k", "p1")], KEYPART).coalesce(1).write.parquet(staging)
    staged = _glob.glob(f"{staging}/part-*.parquet")
    assert staged

    def land_late_file():
        for f in staged:
            shutil.copy(f, src)

    stateful.run_uniqueness_to_completion(
        spark, src, KEYPART, ckpt, out,
        ttl_ms=600_000, on_first_batch=land_late_file,
    )
    dups = {r["image_id"]: r for r in spark.read.parquet(out).collect()}
    assert "k" in dups, "mid-drain file was not drained"
    assert dups["k"]["n_seen"] == 2
    assert dups["k"]["first_part"] == "p0"


def test_ttl_drain_empty_source_returns_promptly(spark, tmp_path):
    """Round-4 advice: an empty source dir must not spin the 600 s
    stall window (zero committed batches leave lastProgress None
    forever) — the drain short-circuits before starting the query."""
    import os
    import time as _time

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = _time.monotonic()
    stateful.run_uniqueness_to_completion(
        spark, src, KEYPART, ckpt, out, ttl_ms=1000
    )
    assert _time.monotonic() - t0 < 30
    assert not os.path.isdir(out) or not os.listdir(out)


# ------------------------- streaming freshness (C35's streaming twin)

def test_streamed_freshness_equals_batch_profile(spark, tmp_path):
    """Running (rows_total, max_ts) per part folded across micro-
    batches must give verdicts identical to the batch
    freshness_profile over the full data — including a part whose
    global max arrives only in the SECOND batch, and an all-null-ts
    part (NOT_READY)."""
    import datetime as dt

    from bigdime_spark.operators.freshness import freshness_profile

    def ts(s):
        return dt.datetime.fromisoformat(s)

    first = spark.createDataFrame(
        [
            ("p0", ts("2024-06-01 10:00:00")),
            ("p0", ts("2024-06-01 11:00:00")),
            ("p1", ts("2024-06-01 09:30:00")),  # stale — and batch-1 max
            ("p2", None),
        ],
        "part string, ts timestamp",
    )
    second = spark.createDataFrame(
        [
            ("p0", ts("2024-06-01 11:55:00")),  # global max lands late
            ("p1", ts("2024-06-01 08:00:00")),  # older than batch 1's
            ("p2", None),
        ],
        "part string, ts timestamp",
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first.repartition(2).write.mode("append").parquet(src)
    stateful.run_freshness_to_completion(
        spark, src, "part string, ts timestamp", ckpt, out
    )
    second.repartition(2).write.mode("append").parquet(src)
    stateful.run_freshness_to_completion(
        spark, src, "part string, ts timestamp", ckpt, out
    )

    latest = stateful.latest_histograms(spark.read.parquet(out))
    streamed = freshness_profile(
        latest, "max_ts", as_of="2024-06-01 12:00:00", max_lag_seconds=3600
    )
    batch = freshness_profile(
        first.union(second), "ts",
        as_of="2024-06-01 12:00:00", max_lag_seconds=3600,
    )
    s = {r["part"]: tuple(r) for r in streamed.collect()}
    b = {r["part"]: tuple(r) for r in batch.collect()}
    assert s == b
    assert s["p0"][3] == "PASS" and s["p0"][1] == "2024-06-01 11:55:00"
    assert s["p1"][3] == "FAIL"
    assert s["p2"][3] == "NOT_READY"
