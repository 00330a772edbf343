"""Pure-scan bandwidth probe (BENCH/BASELINE.md evidence for the
core-regime ceiling).

Reads the cached bench fixture's raw snapshot and folds xxhash64 over
every column into one sum — a no-shuffle, no-Python, whole-stage-
codegen scan. If THIS flattens past ~8 threads at the same byte rate
the decode-off suite does, the suite's sub-linear core scaling is the
box's memory/parquet-decode bandwidth ceiling, not an engine property
(a real 4x cluster brings 4x memory channels and disks with it).

Usage: python tools/scan_probe.py <cpus> <fixture_raw_dir>
Prints one JSON line: {"cpus": N, "wall_sec": s, "gb": G, "gb_per_sec": r}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    cpus = int(sys.argv[1])
    raw_dir = sys.argv[2]

    from pyspark.sql import functions as F

    from bigdime_spark.session import get_spark

    spark = get_spark(
        "scan-probe", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # bit_xor, not sum: ANSI mode (session default) raises on long
    # overflow, and a 1M-row sum of xxhash64 overflows immediately;
    # xor folds the same bytes with no overflow semantics at all.
    # The plan is REBUILT per collect — re-collecting one DataFrame
    # object reuses its AQE-materialized stages (measured 0.05 s for a
    # 16 GB scan), which would fake the bandwidth number.
    def probe():
        raw = spark.read.parquet(raw_dir)
        return raw.select(F.bit_xor(F.xxhash64(*raw.columns)).alias("s"))

    probe().collect()  # warm rep: page cache + codegen
    t0 = time.monotonic()
    probe().collect()
    wall = time.monotonic() - t0
    gb = dir_bytes(raw_dir) / 1e9
    print(
        json.dumps(
            {
                "cpus": cpus,
                "wall_sec": round(wall, 2),
                "gb": round(gb, 2),
                "gb_per_sec": round(gb / wall, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
