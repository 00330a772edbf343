"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB at sf0.01, then compares row count,
column-name set, and order-insensitive values (columns sorted by
name, rows sorted, NaN/None normalized). Exit code 1 on any mismatch.

Usage: python tools/check_contract.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
        else:
            try:
                df[c] = df[c].astype("float64").round(9)
            except (TypeError, ValueError):
                df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main() -> int:
    import __spark_entry__ as e
    from bigdime_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("contract-check", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            failures.append((name, f"SPARK ERROR: {exc}"))
            print(f"FAIL  {name}: spark error: {str(exc)[:2000]}")
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(sdf)} rows, {wall:.1f}s) — no oracle")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append((name, f"DUCKDB ERROR: {exc}"))
            print(f"FAIL  {name}: duckdb error: {str(exc)[:2000]}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rowcount {len(sdf)} vs {len(odf)}"))
            print(f"FAIL  {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        a, b = normalize(sdf), normalize(odf)
        if not a.equals(b):
            diff_mask = ~(a.eq(b) | (a.isna() & b.isna()))
            bad = diff_mask.any(axis=1)
            failures.append((name, "value mismatch"))
            print(f"FAIL  {name}: value mismatch ({int(bad.sum())} rows differ)")
            with pd.option_context("display.width", 200, "display.max_columns", 50):
                print("  spark:", a[bad].head(3).to_dict("records"))
                print("  oracle:", b[bad].head(3).to_dict("records"))
            continue
        print(f"OK    {name}: {len(sdf)} rows match ({wall:.1f}s)")

    print(f"\n{len(failures)} failures" if failures else "\nALL MATCH")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
