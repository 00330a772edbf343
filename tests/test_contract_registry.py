"""Smoke oracle for the driver contract: every queries() entry runs
at sf0.001 with a stable schema; oracle keys are consistent. The full
value-exact DuckDB comparison is tools/check_contract.py (run at
sf0.01, mirrored by the driver per round).
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

needs_testdata = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    # the genuinely non-portable ops are the only ones without oracles
    assert set(qs) - set(oracles) == {"hll_distinct_partkey"}


@needs_testdata
def test_every_query_runs_at_smoke_sf(spark):
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        cols = df.columns
        assert len(cols) > 0, name
        rows = df.limit(5).collect()
        assert rows is not None, name


@needs_testdata
def test_entry_returns_verdicts(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 15
    assert set(df.columns) == {"part", "constraint", "verdict", "observed", "expected"}
    assert {r["verdict"] for r in rows} <= {"PASS", "FAIL", "SKIPPED_CONFIG", "NOT_READY"}
