"""Decode-off (core-regime) scaling profiler.

BENCH/BASELINE.md's open question: the core suite's N→4N efficiency
trails the pure-scan probe's curve, and past windows even showed
local[32] core walls ABOVE local[8] — is that an engine property
(serial driver work, a shuffle that stops scaling) or a machine one
(GC/allocator contention at high thread counts)?

This tool runs the decode-off ValidationSuite once cold + once steady
at a given thread count with the Spark UI enabled, then splits the
steady wall using the REST status API:

- ``busy``   — wall-clock covered by at least one running Spark job
  (union of [submissionTime, completionTime] intervals): executor-side
  scan/shuffle/agg time.
- ``serial`` — wall minus busy: driver-only time (Catalyst analysis /
  optimization / physical planning of the suite's wide fused-agg
  expressions, py4j round-trips, persist bookkeeping between actions).
- ``gc``     — executor totalGCTime delta across the steady run (the
  single local-mode executor), the allocator-contention signal.

Usage: python tools/core_profile.py CPUS [--rows 1000000]
Prints one JSON line; run at 8 and 32 and read the deltas:
serial ~constant → Amdahl floor from driver planning (engine
property, bounded and quantified); busy growing at 32 alongside gc →
single-JVM allocator/GC contention (machine property — a real
cluster's 4× executors bring 4× heaps).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def _parse_ts(s: str) -> float:
    # REST timestamps look like 2026-08-19T12:34:56.789GMT
    import datetime as dt

    return (
        dt.datetime.strptime(s.replace("GMT", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z")
        .timestamp()
    )


def _busy_seconds(jobs: list[dict], t0: float, t1: float) -> float:
    ivals = []
    for j in jobs:
        if "submissionTime" not in j:
            continue
        s = _parse_ts(j["submissionTime"])
        e = _parse_ts(j["completionTime"]) if "completionTime" in j else t1
        s, e = max(s, t0), min(e, t1)
        if e > s:
            ivals.append((s, e))
    ivals.sort()
    busy, cur_s, cur_e = 0.0, None, None
    for s, e in ivals:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cpus", type=int)
    ap.add_argument("--rows", type=int, default=int(os.environ.get("BENCH_ROWS", "1000000")))
    args = ap.parse_args()

    fx_dir = os.environ.get(
        "BENCH_FIXTURE", f"{REPO}/.cache/bench_fx_{args.rows // 1000}k"
    )
    from bigdime_spark.plans.suite import ValidationSuite
    from bigdime_spark.session import get_spark

    spark = get_spark(
        "core-profile",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(32, args.cpus * 2),
        extra_confs={"spark.ui.enabled": "true"},
    )
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    raw = spark.read.parquet(f"{fx_dir}/raw")
    cur = spark.read.parquet(f"{fx_dir}/curated")
    man = spark.read.parquet(f"{fx_dir}/manifest")
    raw.select("part").count()

    def gc_ms() -> int:
        return sum(
            e.get("totalGCTime", 0) for e in _api(base, f"applications/{app_id}/executors")
        )

    def one(run_id: str) -> dict:
        jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
        gc0 = gc_ms()
        t0 = time.time()
        res = ValidationSuite(
            not_null=("image_id", "caption", "w", "h", "fmt"),
            check_decode=False,
        ).run(spark, raw, cur, man, run_id=run_id, resume=False)
        res.verdicts.count()
        res.violations.count()
        res.lineage.collect()
        t1 = time.time()
        res.release()
        jobs = [
            j
            for j in _api(base, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        busy = _busy_seconds(jobs, t0, t1)
        return {
            "wall_sec": round(t1 - t0, 2),
            "busy_sec": round(busy, 2),
            "serial_sec": round((t1 - t0) - busy, 2),
            "n_jobs": len(jobs),
            "gc_sec": round((gc_ms() - gc0) / 1000.0, 2),
        }

    cold = one("prof-cold")
    steady = one("prof-steady")
    print(
        json.dumps(
            {"cpus": args.cpus, "rows": args.rows, "cold": cold, "steady": steady}
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
