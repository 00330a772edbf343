#!/usr/bin/env python
"""Image-suite isolation probe (guide §1): reproduces bench.py's
bench_suite() run shape with BIGDIME_PROFILE phase marks, optional
extra Spark confs from $SUITE_PROBE_CONFS (k=v,k=v), and GC totals
from the status tracker after each run. bench.py itself stays frozen.

Usage:
    SUITE_PROBE_CONFS="spark.driver.memory=48g" python tools/suite_probe.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("BIGDIME_PROFILE", "1")


def gc_totals(spark):
    # sum GC time over all executors (local mode: the driver)
    sc = spark.sparkContext
    jt = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    out = {}
    for i in range(jt.size()):
        b = jt.get(i)
        out[b.getName()] = (b.getCollectionCount(), b.getCollectionTime())
    return out


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rows = int(os.environ.get("BENCH_ROWS", "1000000"))
    parts = int(os.environ.get("BENCH_PARTS", "64"))
    fx_dir = os.environ.get("BENCH_FIXTURE", f"{REPO}/.cache/bench_fx_{rows // 1000}k")
    extra = {}
    for kv in os.environ.get("SUITE_PROBE_CONFS", "").split(","):
        if "=" in kv:
            k, v = kv.split("=", 1)
            extra[k.strip()] = v.strip()

    from bigdime_spark.session import get_spark

    spark = get_spark(
        "suite-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=max(32, cpus * 2),
        extra_confs=extra or None,
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from bench import bench_suite, ensure_fixture  # frozen helpers, read-only

    ensure_fixture(spark, fx_dir, rows, parts)
    raw = spark.read.parquet(f"{fx_dir}/raw")
    cur = spark.read.parquet(f"{fx_dir}/curated")
    man = spark.read.parquet(f"{fx_dir}/manifest")
    raw.select("part").count()

    from bigdime_spark.plans.suite import ValidationSuite

    def one_run(run_id: str, decode: bool = True):
        g0 = gc_totals(spark)
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
        res.release()
        g1 = gc_totals(spark)
        gc_ms = sum(t1 - g0.get(k, (0, 0))[1] for k, (c1, t1) in g1.items())
        print(
            f"== {run_id}: wall={wall:.2f}s gc_delta={gc_ms}ms "
            f"verdicts={n_verdicts} violations={n_violations}",
            file=sys.stderr,
            flush=True,
        )
        return wall

    walls = [one_run(f"probe-full-{i}") for i in range(reps)]
    core = [one_run(f"probe-core-{i}", decode=False) for i in range(reps)]
    print(f"full={walls} core={core}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
