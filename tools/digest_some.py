#!/usr/bin/env python
"""Targeted digest snapshot: like digest_all.py but only for the
query names given on the command line — the fast bit-identity loop
while optimizing one operator ("did my change alter ANY output bit?").

Usage: python tools/digest_some.py name [name ...] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from bigdime_spark.session import get_spark

    spark = get_spark(
        "digest-some", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    from bigdime_spark import contract

    qs = contract.queries()
    out = {}
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("d"),
            ).collect()[0]
            out[name] = [row["n"], row["d"], ",".join(df.columns)]
        except Exception as exc:
            out[name] = ["ERROR", str(exc)[:200], ""]
        print(f"# {name}: {out[name][:2]}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
    print(json.dumps(out, indent=0, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
