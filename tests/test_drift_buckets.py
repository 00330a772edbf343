"""Bucket-level drift triage (C70): the per-bucket contribution frame
must fold back EXACTLY to the aggregate KS/PSI/W1/JS scores (it is the
same intermediate), replay identically from persisted stats arrays,
and annotate buckets with correct value bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.drift import (
    DriftColumn,
    drift_contributions,
    drift_contributions_from_stats,
    top_drift_buckets,
    two_sample_drift_multi,
)
from bigdime_spark.operators.stats import ColumnProfile, StatsProfile
from bigdime_spark.sources.synth import build_fixture

SPECS = (DriftColumn("w", 0.0, 256.0, 32), DriftColumn("h", 0.0, 256.0, 32))
PROFILE = StatsProfile(
    columns=[
        ColumnProfile("w", histogram=(0.0, 256.0, 32)),
        ColumnProfile("h", histogram=(0.0, 256.0, 32)),
    ]
)


def _stats_of(df):
    return df.groupBy("part").agg(*PROFILE.agg_exprs())


def _key_rows(df, ndigits=12):
    out = {}
    for r in df.collect():
        out[(r["part"], r["column"], r["bucket"])] = tuple(
            round(r[c], ndigits) if isinstance(r[c], float) else r[c]
            for c in (
                "lo", "hi", "cnt_r", "cnt_c", "share_r", "share_c",
                "delta_share", "ecdf_gap", "psi_term", "js_term",
            )
        )
    return out


def test_contributions_fold_back_to_aggregate_scores(spark):
    fx = build_fixture(spark, n_rows=400, n_parts=4, drift_parts=(1,))
    agg = {
        (r["part"], r["column"]): r
        for r in two_sample_drift_multi(fx.raw, fx.curated, SPECS).collect()
    }
    contrib = drift_contributions(fx.raw, fx.curated, SPECS).collect()
    by_key: dict[tuple, list] = {}
    for r in contrib:
        by_key.setdefault((r["part"], r["column"]), []).append(r)
    assert set(by_key) == set(agg)
    for key, rows in by_key.items():
        a = agg[key]
        assert sum(r["psi_term"] for r in rows) == pytest.approx(a["psi"], abs=1e-12)
        assert sum(r["js_term"] for r in rows) == pytest.approx(a["js"], abs=1e-12)
        assert max(r["ecdf_gap"] for r in rows) == pytest.approx(a["ks_d"], abs=1e-12)
        # W1 = Σ gap·run-length; reconstruct run lengths from sorted buckets
        srt = sorted(rows, key=lambda r: r["bucket"])
        w1 = sum(
            r["ecdf_gap"] * (nxt["bucket"] - r["bucket"])
            for r, nxt in zip(srt, srt[1:])
        )
        assert w1 == pytest.approx(a["w1"], abs=1e-12)
        # the shares are real proportions
        assert sum(r["share_r"] for r in rows) == pytest.approx(1.0, abs=1e-12)
        assert sum(r["share_c"] for r in rows) == pytest.approx(1.0, abs=1e-12)


def test_contributions_from_stats_equals_scan_path(spark):
    fx = build_fixture(spark, n_rows=400, n_parts=4, drift_parts=(1,))
    scan = drift_contributions(fx.raw, fx.curated, SPECS)
    stored = drift_contributions_from_stats(
        _stats_of(fx.raw), _stats_of(fx.curated)
    )
    assert _key_rows(stored) == _key_rows(scan)


def test_bucket_value_bounds(spark):
    # spec (0, 10, 5) → width 2; plant an underflow, an overflow and
    # interior values in known buckets
    raw = spark.createDataFrame(
        [("p", v) for v in [-1.0, 0.0, 2.5, 9.9, 10.5]], "part string, x double"
    )
    cur = spark.createDataFrame(
        [("p", v) for v in [1.0, 3.0, 5.0]], "part string, x double"
    )
    rows = {
        r["bucket"]: r
        for r in drift_contributions(
            raw, cur, (DriftColumn("x", 0.0, 10.0, 5),)
        ).collect()
    }
    assert rows[0]["lo"] is None and rows[0]["hi"] == 0.0  # underflow
    assert rows[6]["lo"] == 10.0 and rows[6]["hi"] is None  # overflow
    assert (rows[1]["lo"], rows[1]["hi"]) == (0.0, 2.0)
    assert (rows[2]["lo"], rows[2]["hi"]) == (2.0, 4.0)
    assert (rows[5]["lo"], rows[5]["hi"]) == (8.0, 10.0)
    assert rows[0]["cnt_r"] == 1 and rows[0]["cnt_c"] == 0


def test_specless_stats_frames_score_with_null_bounds(spark):
    fx = build_fixture(spark, n_rows=200, n_parts=2)
    spec_cols = [c for c in _stats_of(fx.raw).columns if c.endswith("__hist_spec")]
    sr = _stats_of(fx.raw).drop(*spec_cols)
    sc = _stats_of(fx.curated).drop(*spec_cols)
    stored = drift_contributions_from_stats(sr, sc)
    rows = stored.collect()
    assert rows and all(r["lo"] is None and r["hi"] is None for r in rows)
    # numbers still match the scan path
    want = {
        k: v[2:] for k, v in _key_rows(
            drift_contributions(fx.raw, fx.curated, SPECS)
        ).items()
    }
    got = {k: v[2:] for k, v in _key_rows(stored).items()}
    assert got == want


def test_top_drift_buckets_rank_and_guard(spark):
    fx = build_fixture(spark, n_rows=300, n_parts=2, drift_parts=(0,))
    contrib = drift_contributions(fx.raw, fx.curated, SPECS)
    top = top_drift_buckets(contrib, k=3).collect()
    per_key: dict[tuple, list] = {}
    for r in top:
        per_key.setdefault((r["part"], r["column"]), []).append(r)
    for rows in per_key.values():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        srt = sorted(rows, key=lambda r: r["rank"])
        psis = [abs(r["psi_term"]) for r in srt]
        assert psis == sorted(psis, reverse=True)
    with pytest.raises(ValueError, match="k must be >= 1"):
        top_drift_buckets(contrib, k=0)
