#!/usr/bin/env python
"""Digest snapshot of every registered contract query (optimization
guard): {name: [rows, xor-digest]} printed as JSON. Bit-identical
outputs ⇒ identical digests, so comparing two snapshots proves an
optimization changed no query's result. The digest is the same
count + bit_xor(xxhash64(*)) fold bench.py times.

Usage: python tools/digest_all.py [sf_dir] > digests.json
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from bigdime_spark.session import get_spark

    spark = get_spark(
        "digest-all", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    from bigdime_spark import contract

    out = {}
    for name, fn in contract.queries().items():
        try:
            df = fn(spark, sf_dir)
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("d"),
            ).collect()[0]
            out[name] = [row["n"], row["d"], ",".join(df.columns)]
        except Exception as exc:  # surface, don't abort the sweep
            out[name] = ["ERROR", str(exc)[:200], ""]
        print(f"# {name}: {out[name][:2]}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    print(json.dumps(out, indent=0, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
