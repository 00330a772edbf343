#!/usr/bin/env python
"""Extra benchmark instrumentation for optimization work (guide §1).

NOT the driver's bench — bench.py stays frozen. This tool isolates
where per-query wall time goes at sf0.1:

  build  — Python-side DataFrame construction (contract.py fn call)
  plan   — analysis + optimization + physical planning + codegen of
           the digest-fold plan (forced via queryExecution）
  exec   — the actual job(s), timed exactly like bench.py's _force

Usage:
    python bench_extra.py [query ...]        # default: full HEADLINE
    BENCH_EXTRA_REPS=N python bench_extra.py
    BENCH_EXTRA_PLANS=plans/r06 python bench_extra.py --dump-plans

--dump-plans writes <query>_before.txt (.explain("formatted")) for
every selected query into $BENCH_EXTRA_PLANS (no timing reps).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402  (frozen list, reused read-only)


def _digest_df(df):
    from pyspark.sql import functions as F

    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("digest"),
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dump_plans = "--dump-plans" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("BENCH_EXTRA_REPS", "2"))
    plans_dir = os.environ.get("BENCH_EXTRA_PLANS", "plans/r06")

    from bigdime_spark.session import get_spark

    spark = get_spark(
        "bigdime-bench-extra", master=f"local[{cpus}]", shuffle_partitions=max(32, cpus * 2)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from bigdime_spark import contract

    qs = contract.queries()
    names = args or [n for n in HEADLINE if n in qs]

    if dump_plans:
        os.makedirs(plans_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(txt)
            print(f"# wrote {plans_dir}/{name}.txt", file=sys.stderr)
        return 0

    out = {}
    for name in names:
        rows = []
        for _ in range(reps):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            t1 = time.monotonic()
            d = _digest_df(df)
            # force full planning incl. codegen prep without running jobs
            d._jdf.queryExecution().executedPlan()
            t2 = time.monotonic()
            n = d.collect()[0]["n"]
            t3 = time.monotonic()
            spark.catalog.clearCache()
            rows.append((t1 - t0, t2 - t1, t3 - t2, n))
        b = min(r[0] for r in rows)
        p = min(r[1] for r in rows)
        e = min(r[2] for r in rows)
        out[name] = {"build": round(b, 3), "plan": round(p, 3), "exec": round(e, 3)}
        print(
            f"# {name}: build={b:.2f}s plan={p:.2f}s exec={e:.2f}s "
            f"({rows[0][3]} rows; per-rep {[tuple(round(x,2) for x in r[:3]) for r in rows]})",
            file=sys.stderr,
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
