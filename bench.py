#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line.

Measures (a) headline driver-corpus queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and (b) the flagship image-validation
suite (full: fused stats+constraints, checksum, keyed trio, drift,
decode) on a cached deterministic synthetic fixture — the
validated-images/sec headline of BASELINE.md.

Env:
    SPARK_GRAFT_SF_DIR   testdata dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[N] parallelism (default 32)
    BENCH_ROWS           image fixture rows (default 1000000)
    BENCH_PARTS          image fixture partitions (default 64)
    BENCH_FIXTURE        fixture cache dir (default .cache/bench_fx_<rows>)
    BENCH_QUERY_REPS     in-JVM reps per corpus query, median reported (default 2)
    BENCH_SUITE_REPS     steady/core suite reps, median reported (default 3)

Flags:
    --suite-only         skip corpus queries (used by the scaling harness)
    --skip-suite         corpus queries only

Timing excludes SparkSession startup and fixture generation
(BASELINE.md evidence protocol).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

#: headline corpus queries (one per operator family; all scale-relevant)
HEADLINE = [
    "stats_profile_lineitem",
    "quantiles_lineitem",
    "record_count_check",
    "uniqueness_lineitem_key",
    "referential_counts",
    "checksum_lineitem",
    "drift_extendedprice",
    "drift_table_rollup_orders",
    "quantiles_from_stats_orders",
    "stats_outlier_parts",
    "topk_orders_per_priority",
    "events_json_extract",
    "quality_documents",
    "repetition_documents",
    "fingerprint_documents",
    "contamination_documents",
    "phash_contamination",
    "dup_gram_docs",
    "correlation_lineitem",
    "mutual_info_documents",
    "freshness_events",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_hamming",
    "dedup_simhash_hamming_wide",
    "dedup_phash_hamming",
    "dedup_embedding_ivf",
    "ann_cosine_topk",
    "ann_sq_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "ivf_cell_profile",
    "ivf_recall_curve",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_lsh_nn",
    "ann_hyperplane_recall",
    "sample_stratified_documents",
    "sample_weighted_documents",
    "shard_pack_documents",
    "referential_bloom_customer",
    "kmv_overlap_orders",
    "kmv_churn_orders",
    "bit_balance_documents",
    "categorical_drift_orders",
    "content_diff_orders",
    "embedding_drift",
    "null_pattern_events",
    "distinctness_documents",
    "distinctness_from_stats_documents",
    "sequence_continuity_orders",
    "gap_ranges_orders",
    "fd_events_user_type",
    "type_inference_orders",
    "benford_orders",
    "mask_profile_orders",
    "zone_overlap_orders",
    "verdict_history_orders",
    "metric_trend_orders",
    "metric_zscore_orders",
    "metric_ewma_orders",
    "metric_cusum_orders",
    "compliance_events",
    "slice_lift_events",
    "suggest_constraints_orders",
    "dedup_containment",
    "dedup_consensus",
    "repeated_spans_documents",
    "span_coverage_documents",
    "caption_conflicts",
    "schema_history_orders",
    "drift_buckets_extendedprice",
    "caption_quality_documents",
    "caption_lang_documents",
    "sampled_gate_lineitem",
    "stratified_gate_lineitem",
    "grouped_verdict_events",
    "suite_verdicts_lineitem",
]


def _force(df) -> int:
    """Evaluate a query fully without shipping its rows to the driver:
    one-row count + bit_xor(xxhash64(*)) fold over EVERY output column
    — every row and every column must be computed JVM-side (the hash
    consumes them), but the action returns one row, so the timing
    measures the operator, not py4j serialization of large diagnostic
    row sets (pre-r04 bench numbers for multi-row queries included
    that driver-side transfer: dedup_simhash_hamming shipped 1.7M pair
    rows through collect)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("digest"),
    ).collect()[0]
    return row["n"]


def bench_queries(spark, sf_dir: str, reps: int) -> dict[str, float]:
    """Per-query MEDIAN of ``reps`` in-JVM repetitions (round-3 verdict:
    single-run artifacts chase host noise). clearCache() between reps
    kills plan-matched cache reuse — Spark substitutes persisted frames
    by logical-plan equality, so without it rep 2 of a query that
    persists internally would silently replay rep 1's caches."""
    import statistics

    from bigdime_spark import contract

    qs = contract.queries()
    out: dict[str, float] = {}
    for name in HEADLINE:
        walls = []
        for _ in range(max(1, reps)):
            t0 = time.monotonic()
            n = _force(qs[name](spark, sf_dir))
            walls.append(time.monotonic() - t0)
            spark.catalog.clearCache()
        out[name] = round(statistics.median(walls), 3)
        print(
            f"# {name}: median {out[name]}s of "
            f"{[round(w, 2) for w in walls]} ({n} rows)",
            file=sys.stderr,
        )
    return out


def ensure_fixture(spark, fx_dir: str, rows: int, parts: int) -> None:
    from bigdime_spark.sources.synth import build_fixture

    # a killed generation leaves a complete raw/ next to a partial
    # curated/ — demand every table's _SUCCESS commit marker, and
    # discard the whole fixture otherwise (benchmarking against a
    # half-written snapshot would silently undercount the suite).
    tables = ("raw", "curated", "manifest")
    if all(os.path.isfile(f"{fx_dir}/{t}/_SUCCESS") for t in tables):
        return
    if os.path.isdir(fx_dir):
        import shutil

        print(f"# discarding incomplete fixture at {fx_dir}", file=sys.stderr)
        shutil.rmtree(fx_dir)
    print(f"# generating fixture {rows} rows → {fx_dir}", file=sys.stderr)
    from bigdime_spark.sources.tables import write_table

    fx = build_fixture(spark, n_rows=rows, n_parts=parts)
    write_table(fx.raw, f"{fx_dir}/raw")
    write_table(fx.curated, f"{fx_dir}/curated")
    write_table(fx.manifest, f"{fx_dir}/manifest", partition_by=None)


def bench_suite(spark, fx_dir: str, rows: int, parts: int) -> dict:
    from bigdime_spark.plans.suite import ValidationSuite

    ensure_fixture(spark, fx_dir, rows, parts)
    raw = spark.read.parquet(f"{fx_dir}/raw")
    cur = spark.read.parquet(f"{fx_dir}/curated")
    man = spark.read.parquet(f"{fx_dir}/manifest")
    raw.select("part").count()  # warm metadata/scan paths

    def one_run(run_id: str, decode: bool = True) -> tuple[float, int, dict]:
        t0 = time.monotonic()
        res = ValidationSuite(
            not_null=("image_id", "caption", "w", "h", "fmt"),
            check_decode=decode,
            decode_seed=42,
        ).run(spark, raw, cur, man, run_id=run_id, resume=False)
        n_verdicts = res.verdicts.count()
        n_violations = res.violations.count()
        lineage = res.lineage.collect()
        wall = time.monotonic() - t0
        res.release()  # drop ALL persisted frames so the next run
        # recomputes instead of hitting plan-matched caches
        scanned = sum(r["rows_scanned"] for r in lineage)
        return wall, scanned, {"verdicts": n_verdicts, "violations": n_violations}

    # rep 1 pays one-time JVM/codegen/footer warmup (the "cold" wall);
    # steady-state reps follow — the regime a 10^12-row run lives in
    # (BASELINE.md measurement excludes one-time startup). The HEADLINE
    # is the MEDIAN of the steady reps (round-3 verdict: single-run
    # artifacts chase host noise); every per-rep wall is reported.
    import statistics

    steady_reps = max(1, int(os.environ.get("BENCH_SUITE_REPS", "3")))
    cold_wall, _, _ = one_run("bench-cold")
    steady_walls, scanned, extra = [], 0, {}
    for i in range(steady_reps):
        w, scanned, extra = one_run(f"bench-steady-{i}")
        steady_walls.append(w)
    wall = statistics.median(steady_walls)
    # decode-off runs: break the Arrow-boundary cost out of the
    # headline so the decode regime is visible per round (the full
    # suite, incl. the (2,8) scaling evidence, runs WITH decode)
    core_walls = [one_run(f"bench-core-{i}", decode=False)[0] for i in range(steady_reps)]
    core_wall = statistics.median(core_walls)
    n_parts = raw.select("part").distinct().count()
    best = min(cold_wall, *steady_walls)
    return {
        "rows": rows,
        "parts": n_parts,
        "rows_scanned": scanned,
        **extra,
        "cold_wall_sec": round(cold_wall, 2),
        "steady_walls_sec": [round(w, 2) for w in steady_walls],
        "core_walls_sec": [round(w, 2) for w in core_walls],
        "wall_sec": round(wall, 2),
        "core_wall_sec": round(core_wall, 2),
        "images_per_sec": round(scanned / wall, 1) if wall > 0 else None,
        "core_images_per_sec": round(scanned / core_wall, 1) if core_wall > 0 else None,
        "best_images_per_sec": round(scanned / best, 1) if best > 0 else None,
        "best_run": "steady" if wall <= cold_wall else "cold",
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite-only", action="store_true")
    ap.add_argument("--skip-suite", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("BENCH_ROWS", "1000000"))
    parts = int(os.environ.get("BENCH_PARTS", "64"))
    fx_dir = os.environ.get("BENCH_FIXTURE", f"{REPO}/.cache/bench_fx_{rows // 1000}k")

    from bigdime_spark.session import get_spark

    spark = get_spark(
        "bigdime-bench", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    query_reps = int(os.environ.get("BENCH_QUERY_REPS", "2"))
    queries: dict[str, float] = {}
    suite: dict = {}
    if not args.suite_only:
        queries = bench_queries(spark, sf_dir, query_reps)
    if not args.skip_suite:
        if args.suite_only:
            suite = bench_suite(spark, fx_dir, rows, parts)
        else:
            # the suite must NOT share a JVM with the 75 query reps:
            # measured 2026-08-20, the same suite reads 31.5 s steady
            # in a fresh JVM vs 107 s after the query battery (heap /
            # page-cache state, not a plan property). A 10^12-row run
            # lives in a dedicated job, so the representative number
            # is the isolated one.
            import subprocess

            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--suite-only"],
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
            suite = json.loads(line)["suite"]
        queries["image_suite_full"] = suite["wall_sec"]
        queries["image_suite_core"] = suite["core_wall_sec"]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": round(sum(queries.values()), 2),
                "unit": "sec",
                # measurement contract marker (round-4 changed per-query
                # timing to a 1-row count+bit_xor(xxhash64) fold, medians
                # of N in-JVM reps): cross-round tooling must not compare
                # r3-era transfer-inclusive numbers with these
                "methodology": (
                    f"operator-only digest fold, median-of-{query_reps} "
                    "in-JVM reps, clearCache between reps; image suite "
                    "in its own fresh JVM (subprocess), median of "
                    "steady reps"
                ),
                "queries": queries,
                # headline membership grows across rounds (r5 added the
                # sampling/shard-pack queries): compare per-query walls,
                # not totals, across bench artifacts with different counts
                "headline_n": len(HEADLINE),
                "sf": sf_val,
                "cpus": cpus,
                "images_per_sec": suite.get("images_per_sec"),
                "suite": suite,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
