"""Run-over-run metric anomaly detection
(operators/outliers.metric_trend + CLI `trend`). SQL-oracle twin:
`metric_trend_orders` in the driver contract.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli
from bigdime_spark.operators.outliers import metric_trend

SCHEMA = "run_id string, part string, rows double, bytes double"


def _trend(spark, rows, **kw):
    return metric_trend(
        spark.createDataFrame(rows, SCHEMA), ["rows", "bytes"], **kw
    )


def test_verdict_classes(spark):
    rows = [
        # p0: rows stable, bytes collapses 60% → ANOMALY
        ("r1", "p0", 100.0, 1000.0),
        ("r2", "p0", 102.0, 1010.0),
        ("r3", "p0", 101.0, 400.0),
        # p1: rows goes 0 → 5 (infinite rate), bytes NULL latest
        ("r1", "p1", 0.0, 50.0),
        ("r2", "p1", 0.0, 50.0),
        ("r3", "p1", 5.0, None),
    ]
    out = {(r["part"], r["metric"]): r for r in _trend(spark, rows).collect()}
    assert len(out) == 4
    r = out[("p0", "rows")]
    assert r["verdict"] == "OK" and r["run_id"] == "r3"
    assert r["prev_run_id"] == "r2" and r["prev_value"] == 102.0
    b = out[("p0", "bytes")]
    assert b["verdict"] == "ANOMALY"
    assert b["rel_change"] == round(abs(400.0 - 1010.0) / 1010.0, 6)
    z = out[("p1", "rows")]
    assert z["verdict"] == "ANOMALY" and z["rel_change"] is None
    n = out[("p1", "bytes")]
    assert n["verdict"] == "NOT_READY" and n["value"] is None


def test_single_run_not_ready_and_zero_stable(spark):
    rows = [("r1", "p0", 7.0, 0.0), ("r2", "p0", 7.0, 0.0)]
    out = {(r["part"], r["metric"]): r for r in _trend(spark, rows).collect()}
    assert out[("p0", "bytes")]["verdict"] == "OK"  # 0 → 0 is stable
    single = {
        r["metric"]: r
        for r in _trend(spark, [("r1", "p0", 7.0, 1.0)]).collect()
    }
    assert all(r["verdict"] == "NOT_READY" for r in single.values())


def test_threshold_is_strict(spark):
    rows = [("r1", "p0", 100.0, 100.0), ("r2", "p0", 150.0, 151.0)]
    out = {
        r["metric"]: r
        for r in _trend(spark, rows, max_rel_change=0.5).collect()
    }
    assert out["rows"]["verdict"] == "OK"  # exactly 0.5 is not above
    assert out["bytes"]["verdict"] == "ANOMALY"  # 0.51 is


def test_refusals(spark):
    df = [("r1", "p0", 1.0, 1.0)]
    with pytest.raises(ValueError, match="run_id"):
        metric_trend(
            spark.createDataFrame([("p0", 1.0)], "part string, rows double"),
            ["rows"],
        )
    with pytest.raises(ValueError, match="max_rel_change"):
        _trend(spark, df, max_rel_change=0.0)
    with pytest.raises(ValueError, match="at least one"):
        metric_trend(spark.createDataFrame(df, SCHEMA), [])
    with pytest.raises(ValueError, match="not in history"):
        metric_trend(spark.createDataFrame(df, SCHEMA), ["nope"])
    with pytest.raises(ValueError, match="duplicate"):
        _trend(spark, df + df).collect()


def test_cli_trend_and_run_stamps_stats(spark, tmp_path_factory, capsys):
    """The run CLI stamps run_id on <out>/stats; two runs' stats union
    into the trend history, and a planted metric collapse exits 1."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("trend")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/stats")
    assert {r["run_id"] for r in s1.select("run_id").distinct().collect()} == {"r0001"}
    # second "run": same stats restamped with one metric collapsed 90%
    s2 = s1.withColumn("run_id", F.lit("r0002")).withColumn(
        "stat__rows", (F.col("stat__rows") / 10).cast(dict(s1.dtypes)["stat__rows"])
    )
    s1.unionByName(s2).write.parquet(f"{d}/hist")
    capsys.readouterr()
    rc = cli.main(["trend", "--history", f"{d}/hist", "--metrics", "stat__rows"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["verdicts"]["ANOMALY"] == 2  # both parts collapsed
    assert out["worst"][0]["metric"] == "stat__rows"
    # stable history → exit 0
    s3 = s1.withColumn("run_id", F.lit("r0002"))
    s1.unionByName(s3).write.parquet(f"{d}/hist_ok")
    assert cli.main(["trend", "--history", f"{d}/hist_ok",
                     "--metrics", "stat__rows"]) == 0
    capsys.readouterr()
    # operator error → exit 2
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "nope"]) == 2

# ---------------------------------------------------------------- C54
# metric_zscore: the whole-history robust-z complement. SQL-oracle
# twin: metric_zscore_orders in the driver contract.

from bigdime_spark.operators.outliers import metric_zscore


def _zscore(spark, rows, **kw):
    return metric_zscore(
        spark.createDataFrame(rows, SCHEMA), ["rows", "bytes"], **kw
    )


def _six_run_history():
    """Six runs over three parts covering every verdict class; the
    pairs of (rows, bytes) patterns mirror the contract query."""
    rows = []
    for i in range(1, 7):
        # p0.rows: jump off a tight history -> ANOMALY (mad > 0);
        # p0.bytes: constant 42, latest on it -> OK via mad=0 branch
        rows.append((f"r{i}", "p0", float(100 + i) if i < 6 else 500.0, 42.0))
        # p1.rows: constant 7 priors, latest 9 -> ANOMALY, z NULL;
        # p1.bytes: NULL latest -> NOT_READY
        rows.append(
            (f"r{i}", "p1", 7.0 if i < 6 else 9.0,
             float(50 + i) if i < 6 else None)
        )
        # p2.rows: 1 non-null prior < min_history -> NOT_READY;
        # p2.bytes: NULL prior at i=2 -> 4-element interpolated med/MAD
        rows.append(
            (f"r{i}", "p2", float(10 * i) if i >= 5 else None,
             None if i == 2 else float(100 + (i % 3)) if i < 6 else 100.0)
        )
    return rows


def test_zscore_verdict_classes(spark):
    out = {
        (r["part"], r["metric"]): r
        for r in _zscore(spark, _six_run_history()).collect()
    }
    assert len(out) == 6
    a = out[("p0", "rows")]  # priors {101..105}: med 103, mad 1
    assert a["verdict"] == "ANOMALY" and a["run_id"] == "r6"
    assert (a["med"], a["mad"], a["n_history"]) == (103.0, 1.0, 5)
    assert a["robust_z"] == round(0.6745 * (500.0 - 103.0) / 1.0, 6)
    c = out[("p0", "bytes")]  # constant history, latest on it
    assert c["verdict"] == "OK" and c["mad"] == 0.0 and c["robust_z"] is None
    m = out[("p1", "rows")]  # constant history, latest OFF it
    assert m["verdict"] == "ANOMALY" and m["robust_z"] is None
    n = out[("p1", "bytes")]
    assert n["verdict"] == "NOT_READY" and n["value"] is None
    s = out[("p2", "rows")]  # one non-null prior < min_history=3
    assert s["verdict"] == "NOT_READY" and s["n_history"] == 1
    i = out[("p2", "bytes")]  # NULL prior excluded -> even-count medians
    assert (i["n_history"], i["med"], i["mad"]) == (4, 101.0, 0.5)
    assert i["verdict"] == "OK"
    assert i["robust_z"] == round(0.6745 * (100.0 - 101.0) / 0.5, 6)


def test_zscore_catches_drift_the_step_gate_misses(spark):
    """Two consecutive 40% steps each pass a 50% step gate, but the
    result sits ~65 robust-z off the stable history — the motivating
    complementarity (the last-vs-prev gate only ever sees one step)."""
    vals = [100.0, 101.0, 99.0, 100.0, 101.0, 100.0, 140.0, 196.0]
    rows = [(f"r{i}", "p0", vals[i - 1], 1.0) for i in range(1, 9)]
    df = spark.createDataFrame(rows, SCHEMA)
    step = {r["metric"]: r for r in metric_trend(df, ["rows"]).collect()}
    assert step["rows"]["verdict"] == "OK"
    z = {r["metric"]: r for r in metric_zscore(df, ["rows"]).collect()}
    assert z["rows"]["verdict"] == "ANOMALY"


def test_zscore_threshold_strict_and_min_history(spark):
    # priors {99,100,101,100}: med 100, mad 0.5; latest 102 -> z 2.698
    rows = [
        ("r1", "p0", 99.0, 1.0), ("r2", "p0", 100.0, 1.0),
        ("r3", "p0", 101.0, 1.0), ("r4", "p0", 100.0, 1.0),
        ("r5", "p0", 102.0, 1.0),
    ]
    z = round(0.6745 * 2.0 / 0.5, 6)
    at = {r["metric"]: r for r in _zscore(spark, rows, threshold=z).collect()}
    assert at["rows"]["verdict"] == "OK"  # exactly-at passes (strict >)
    above = {
        r["metric"]: r for r in _zscore(spark, rows, threshold=z - 0.01).collect()
    }
    assert above["rows"]["verdict"] == "ANOMALY"
    # min_history raised above the available priors -> NOT_READY
    high = {
        r["metric"]: r for r in _zscore(spark, rows, min_history=5).collect()
    }
    assert high["rows"]["verdict"] == "NOT_READY"


def test_zscore_refusals(spark):
    df = [("r1", "p0", 1.0, 1.0)]
    with pytest.raises(ValueError, match="threshold"):
        _zscore(spark, df, threshold=0.0)
    with pytest.raises(ValueError, match="min_history"):
        _zscore(spark, df, min_history=0)
    with pytest.raises(ValueError, match="run_id"):
        metric_zscore(
            spark.createDataFrame([("p0", 1.0)], "part string, rows double"),
            ["rows"],
        )
    with pytest.raises(ValueError, match="duplicate"):
        _zscore(spark, df + df).collect()


def test_cli_trend_zscore_mode(spark, tmp_path_factory, capsys):
    """--zscore scores latest-vs-whole-history: four stable runs plus
    a collapsed fifth exit 1 with med/mad/robust_z in the worst rows;
    a stable fifth exits 0; bad threshold exits 2."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("zscore")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/stats")
    rows_t = dict(s1.dtypes)["stat__rows"]
    jitter = [0, 1, -1, 0]  # tight history so MAD is small but nonzero
    runs = [
        s1.withColumn("run_id", F.lit(f"r{i:04d}")).withColumn(
            "stat__rows", (F.col("stat__rows") + jitter[i - 1]).cast(rows_t)
        )
        for i in range(1, 5)
    ]
    bad = s1.withColumn("run_id", F.lit("r0005")).withColumn(
        "stat__rows", (F.col("stat__rows") / 10).cast(rows_t)
    )
    hist = runs[0]
    for fr in runs[1:]:
        hist = hist.unionByName(fr)
    hist.unionByName(bad).write.parquet(f"{d}/hist")
    capsys.readouterr()
    rc = cli.main(["trend", "--history", f"{d}/hist",
                   "--metrics", "stat__rows", "--zscore", "3.5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["mode"] == "zscore"
    assert out["verdicts"]["ANOMALY"] == 2  # both parts collapsed
    assert {"med", "mad", "robust_z"} <= set(out["worst"][0])
    # stable fifth run -> exit 0
    ok = s1.withColumn("run_id", F.lit("r0005"))
    hist.unionByName(ok).write.parquet(f"{d}/hist_ok")
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist_ok",
                     "--metrics", "stat__rows", "--zscore", "3.5"]) == 0
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--zscore", "-1"]) == 2


# ------------------------------------------------- property test (C54)
# hypothesis draws a random run_id-stamped history (integer-valued
# doubles and NULLs, so medians/MADs are exact binary arithmetic in
# both engines) and metric_zscore must agree with an independent
# pure-python reference on every field. Examples are few (one Spark
# job each); the drawn space covers short/constant/NULL-heavy and
# mixed histories.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HVAL = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
history_strategy = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2", "r3", "r4", "r5", "r6"]),
        st.sampled_from(["p0", "p1"]),
        _HVAL,
        _HVAL,
    ),
    min_size=1,
    max_size=24,
    unique_by=lambda t: (t[0], t[1]),
)


def _ref_zscore(rows, threshold=3.5, min_history=3):
    from statistics import median

    by_key: dict = {}
    for run, part, a, b in rows:
        for metric, v in (("rows", a), ("bytes", b)):
            by_key.setdefault((part, metric), []).append(
                (run, None if v is None else float(v))
            )
    out = {}
    for (part, metric), seq in by_key.items():
        seq.sort()
        _, x = seq[-1]
        priors = [v for _, v in seq[:-1] if v is not None]
        n = len(priors)
        med = median(priors) if priors else None
        mad = median(abs(v - med) for v in priors) if priors else None
        z = 0.6745 * (x - med) / mad if (x is not None and mad) else None
        if x is None or n < min_history:
            verdict = "NOT_READY"
        elif mad and mad > 0:
            verdict = "ANOMALY" if abs(z) > threshold else "OK"
        elif x != med:
            verdict = "ANOMALY"
        else:
            verdict = "OK"
        out[(part, metric)] = (n, med, mad, z, verdict)
    return out


@given(rows=history_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_zscore_property_vs_python_reference(spark, rows):
    data = [
        (run, part, None if a is None else float(a),
         None if b is None else float(b))
        for run, part, a, b in rows
    ]
    got = {
        (r["part"], r["metric"]): r
        for r in _zscore(spark, data).collect()
    }
    ref = _ref_zscore(rows)
    assert set(got) == set(ref)
    for key, (n, med, mad, z, verdict) in ref.items():
        r = got[key]
        assert r["verdict"] == verdict, (key, dict(r.asDict()), ref[key])
        assert r["n_history"] == n
        for name, want in (("med", med), ("mad", mad), ("robust_z", z)):
            if want is None:
                assert r[name] is None, (key, name, r[name])
            else:
                assert abs(r[name] - want) < 1e-6, (key, name, r[name], want)


# ------------------------------------------------- EWMA mode (C56)

from bigdime_spark.operators.outliers import metric_ewma


def _ewma(spark, rows, **kw):
    return metric_ewma(
        spark.createDataFrame(rows, SCHEMA), ["rows", "bytes"], **kw
    )


def test_ewma_verdict_classes_exact_values(spark):
    """Hand-computed α=0.5 weights (all powers of two — exact fp):
    priors 10,12,11,13,12 → ewma 12.0, var 0.625. A 12.5 latest is
    OK (z 0.632456); a 100.0 latest is ANOMALY; a constant history
    degrades to exact inequality with z NULL both ways."""
    rows = []
    pri = [10.0, 12.0, 11.0, 13.0, 12.0]
    for i, v in enumerate(pri, start=1):
        rows.append((f"r{i}", "p0", v, v))
        rows.append((f"r{i}", "p1", 42.0, 7.0))
    rows.append(("r6", "p0", 12.5, 100.0))
    rows.append(("r6", "p1", 42.0, 9.0))
    out = {
        (r["part"], r["metric"]): r
        for r in _ewma(spark, rows, alpha=0.5, threshold=3.0).collect()
    }
    ok = out[("p0", "rows")]
    assert (ok["ewma"], ok["ewmstd"]) == (12.0, 0.790569)
    assert (ok["z"], ok["verdict"], ok["n_history"]) == (0.632456, "OK", 5)
    spike = out[("p0", "bytes")]
    assert spike["verdict"] == "ANOMALY" and spike["z"] == 111.312174
    flat_on = out[("p1", "rows")]
    assert (flat_on["ewmstd"], flat_on["z"], flat_on["verdict"]) == (
        0.0, None, "OK",
    )
    flat_off = out[("p1", "bytes")]
    assert (flat_off["ewmstd"], flat_off["z"], flat_off["verdict"]) == (
        0.0, None, "ANOMALY",
    )


def test_ewma_forgets_level_shift_the_median_still_flags(spark):
    """The C56 niche: after a legitimate level shift (five runs at
    100, then 199/201/200), a healthy 200.0 latest is OK under the
    recency-weighted baseline but ANOMALY under C54's whole-history
    median/MAD (median still 100, MAD 0 → exact-inequality flag)."""
    from bigdime_spark.operators.outliers import metric_zscore

    vals = [100.0] * 5 + [199.0, 201.0, 200.0, 200.0]
    rows = [(f"r{i}", "p0", v, v) for i, v in enumerate(vals, start=1)]
    df = spark.createDataFrame(rows, SCHEMA)
    e = metric_ewma(df, ["rows"], alpha=0.5, threshold=3.0).first()
    z = metric_zscore(df, ["rows"], threshold=3.5).first()
    assert e["verdict"] == "OK" and e["ewma"] == 187.625
    assert z["verdict"] == "ANOMALY"


def test_ewma_min_history_and_null_latest(spark):
    rows = [
        ("r1", "p0", None, 50.0),
        ("r2", "p0", None, 51.0),
        ("r3", "p0", 10.0, 52.0),
        ("r4", "p0", 11.0, 53.0),
        ("r5", "p0", 12.0, None),
    ]
    out = {
        r["metric"]: r
        for r in _ewma(spark, rows, alpha=0.5, min_history=3).collect()
    }
    # rows: only 2 non-null priors → NOT_READY (NULLs never zero-fill)
    assert out["rows"]["verdict"] == "NOT_READY"
    assert out["rows"]["n_history"] == 2
    # bytes: NULL latest → NOT_READY even with enough history
    assert out["bytes"]["verdict"] == "NOT_READY"


def test_ewma_refusals(spark):
    df = spark.createDataFrame([("r1", "p0", 1.0, 1.0)], SCHEMA)
    for alpha in (0.0, 1.0, -0.5, 1.5):
        with pytest.raises(ValueError, match="alpha"):
            metric_ewma(df, ["rows"], alpha=alpha)
    with pytest.raises(ValueError, match="threshold"):
        metric_ewma(df, ["rows"], threshold=0.0)
    with pytest.raises(ValueError, match="min_history"):
        metric_ewma(df, ["rows"], min_history=0)


def test_cli_trend_ewma_mode(spark, tmp_path_factory, capsys):
    """--ewma ALPHA drives the EWMA baseline through the CLI: a
    planted 90% collapse exits 1 with ewma/ewmstd/z in the worst
    rows; a stable latest exits 0; --zscore alongside --ewma and an
    out-of-range alpha exit 2."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("ewma")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/stats")
    rows_t = dict(s1.dtypes)["stat__rows"]
    jitter = [0, 1, -1, 0]
    runs = [
        s1.withColumn("run_id", F.lit(f"r{i:04d}")).withColumn(
            "stat__rows", (F.col("stat__rows") + jitter[i - 1]).cast(rows_t)
        )
        for i in range(1, 5)
    ]
    bad = s1.withColumn("run_id", F.lit("r0005")).withColumn(
        "stat__rows", (F.col("stat__rows") / 10).cast(rows_t)
    )
    hist = runs[0]
    for fr in runs[1:]:
        hist = hist.unionByName(fr)
    hist.unionByName(bad).write.parquet(f"{d}/hist")
    capsys.readouterr()
    rc = cli.main(["trend", "--history", f"{d}/hist",
                   "--metrics", "stat__rows", "--ewma", "0.5"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["mode"] == "ewma"
    assert out["verdicts"]["ANOMALY"] == 2
    assert {"ewma", "ewmstd", "z"} <= set(out["worst"][0])
    ok = s1.withColumn("run_id", F.lit("r0005"))
    hist.unionByName(ok).write.parquet(f"{d}/hist_ok")
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist_ok",
                     "--metrics", "stat__rows", "--ewma", "0.5"]) == 0
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--ewma", "0.5",
                     "--zscore", "3.5"]) == 2
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--ewma", "1.5"]) == 2


# ------------------------------------------------- Holt-Winters (HW)

from bigdime_spark.operators.outliers import metric_holt_winters

#: period-4 pattern, integral values exactly representable so the
#: additive recursion is float-exact (residuals identically 0)
_HW_PATTERN = [10.0, 20.0, 10.0, 60.0]


def _hw_rows(n_priors, latest, part="p0"):
    vals = [_HW_PATTERN[i % 4] for i in range(n_priors)] + [latest]
    return [(f"r{i:02d}", part, v, v) for i, v in enumerate(vals, start=1)]


def test_hw_accepts_seasonal_peak_the_zscore_flags(spark):
    """The C-family niche: 11 priors of a perfect period-4 pattern put
    the latest run at the seasonal PEAK (phase 3, value 60). The
    whole-history median/MAD gate flags it (median 10, MAD 0 — the
    peak IS far from its history); Holt-Winters forecasts exactly 60
    and says OK. A genuinely broken latest (200) still fails."""
    from bigdime_spark.operators.outliers import metric_zscore

    df = spark.createDataFrame(_hw_rows(11, 60.0), SCHEMA)
    hw = metric_holt_winters(df, ["rows"], season=4).first()
    assert (hw["verdict"], hw["forecast"], hw["sigma"]) == ("OK", 60.0, 0.0)
    assert hw["z"] is None  # σ=0 degradation, exact-equality OK
    z = metric_zscore(df, ["rows"], threshold=3.5).first()
    assert z["verdict"] == "ANOMALY"  # healthy peak, flagged wrongly

    broken = spark.createDataFrame(_hw_rows(11, 200.0), SCHEMA)
    hb = metric_holt_winters(broken, ["rows"], season=4).first()
    assert hb["verdict"] == "ANOMALY" and hb["forecast"] == 60.0


def test_hw_noisy_history_scores_a_real_z(spark):
    """One +1 blip inside the priors makes σ > 0: the on-pattern
    latest scores a finite small |z| → OK."""
    rows = _hw_rows(11, 60.0)
    r5 = rows[5]
    rows[5] = (r5[0], r5[1], r5[2] + 1.0, r5[3] + 1.0)
    df = spark.createDataFrame(rows, SCHEMA)
    hw = metric_holt_winters(df, ["rows"], season=4, threshold=3.0).first()
    assert hw["sigma"] > 0 and hw["z"] is not None
    assert hw["verdict"] == "OK"


def test_hw_not_ready_conventions(spark):
    # 7 priors < 2*4 → NOT_READY
    short = spark.createDataFrame(_hw_rows(7, 10.0), SCHEMA)
    assert metric_holt_winters(short, ["rows"], season=4).first()[
        "verdict"
    ] == "NOT_READY"
    # a NULL prior breaks phase arithmetic → NOT_READY, never a guess
    rows = _hw_rows(11, 60.0)
    r3 = rows[3]
    rows[3] = (r3[0], r3[1], None, r3[3])
    gap = spark.createDataFrame(rows, SCHEMA)
    out = {r["metric"]: r for r in metric_holt_winters(
        gap, ["rows", "bytes"], season=4).collect()}
    assert out["rows"]["verdict"] == "NOT_READY"
    assert out["bytes"]["verdict"] == "OK"  # untouched metric unaffected
    # NULL latest → NOT_READY
    rows = _hw_rows(11, 60.0)
    last = rows[-1]
    rows[-1] = (last[0], last[1], None, last[3])
    nl = spark.createDataFrame(rows, SCHEMA)
    assert metric_holt_winters(nl, ["rows"], season=4).first()[
        "verdict"
    ] == "NOT_READY"


def test_hw_refusals(spark):
    df = spark.createDataFrame([("r1", "p0", 1.0, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="season"):
        metric_holt_winters(df, ["rows"], season=1)
    for kw in ({"alpha": 0.0}, {"beta": 1.0}, {"gamma": -0.1}):
        with pytest.raises(ValueError, match=list(kw)[0]):
            metric_holt_winters(df, ["rows"], **kw)
    with pytest.raises(ValueError, match="threshold"):
        metric_holt_winters(df, ["rows"], threshold=0.0)


def _ref_holt_winters(vals, m=2, a=0.3, b=0.1, g=0.3, thr=3.0):
    """Independent pure-python reference of the additive fit."""
    import math

    x, priors = vals[-1], vals[:-1]
    n = len(priors)
    if x is None or n < 2 * m or any(v is None for v in priors):
        return ("NOT_READY", None, None, None)
    y = [float(v) for v in priors]
    mean1 = sum(y[:m]) / m
    mean2 = sum(y[m:2 * m]) / m
    lvl, trend = mean1, (mean2 - mean1) / m
    seas = [y[i] - mean1 for i in range(m)]
    resids = []
    for t in range(m, n):
        resids.append(y[t] - (lvl + trend + seas[t % m]))
        new_lvl = a * (y[t] - seas[t % m]) + (1 - a) * (lvl + trend)
        trend = b * (new_lvl - lvl) + (1 - b) * trend
        seas[t % m] = g * (y[t] - new_lvl) + (1 - g) * seas[t % m]
        lvl = new_lvl
    fc = lvl + trend + seas[n % m]
    sig = math.sqrt(sum(r * r for r in resids) / len(resids))
    if sig > 0:
        z = (float(x) - fc) / sig
        return ("ANOMALY" if abs(z) > thr else "OK", fc, sig, z)
    return ("ANOMALY" if float(x) != fc else "OK", fc, 0.0, None)


_HWVAL = st.one_of(st.none(), st.integers(min_value=-4, max_value=4))


@given(vals=st.lists(_HWVAL, min_size=1, max_size=12))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hw_property_vs_python_reference(spark, vals):
    rows = [
        (f"r{i:02d}", "p0", None if v is None else float(v), 0.0)
        for i, v in enumerate(vals, start=1)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = metric_holt_winters(df, ["rows"], season=2).first()
    verdict, fc, sig, z = _ref_holt_winters(
        [None if v is None else float(v) for v in vals]
    )
    assert got["verdict"] == verdict
    for name, ref in (("forecast", fc), ("sigma", sig), ("z", z)):
        if ref is None:
            assert got[name] is None
        else:
            assert got[name] == pytest.approx(round(ref, 6), abs=1e-6)


def test_cli_trend_hw_mode(spark, tmp_path_factory, capsys):
    """--hw SEASON through the CLI: a period-2 jitter history with an
    on-pattern fifth run exits 0; a collapsed fifth exits 1 with
    forecast/sigma/z in the worst rows; --hw with --ewma and a bad
    season exit 2."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("hw")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/stats")
    rows_t = dict(s1.dtypes)["stat__rows"]
    jitter = [0, 1, 0, 1]  # perfect period-2 pattern
    runs = [
        s1.withColumn("run_id", F.lit(f"r{i:04d}")).withColumn(
            "stat__rows", (F.col("stat__rows") + jitter[i - 1]).cast(rows_t)
        )
        for i in range(1, 5)
    ]
    hist = runs[0]
    for fr in runs[1:]:
        hist = hist.unionByName(fr)
    bad = s1.withColumn("run_id", F.lit("r0005")).withColumn(
        "stat__rows", (F.col("stat__rows") / 10).cast(rows_t)
    )
    hist.unionByName(bad).write.parquet(f"{d}/hist")
    capsys.readouterr()
    rc = cli.main(["trend", "--history", f"{d}/hist",
                   "--metrics", "stat__rows", "--hw", "2"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["mode"] == "holt_winters"
    assert out["verdicts"]["ANOMALY"] == 2
    assert {"forecast", "sigma", "z"} <= set(out["worst"][0])
    # on-pattern fifth run (phase 0 → expected = base value) → exit 0
    ok = s1.withColumn("run_id", F.lit("r0005"))
    hist.unionByName(ok).write.parquet(f"{d}/hist_ok")
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist_ok",
                     "--metrics", "stat__rows", "--hw", "2"]) == 0
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--hw", "2",
                     "--ewma", "0.5"]) == 2
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--hw", "1"]) == 2


# ------------------------------------------------- CUSUM mode (C60)

from bigdime_spark.operators.outliers import metric_cusum


def _cusum(spark, rows, **kw):
    return metric_cusum(
        spark.createDataFrame(rows, SCHEMA), ["rows", "bytes"], **kw
    )


def _series(part, vals):
    return [
        (f"r{i}", part, None if v is None else float(v), None)
        for i, v in enumerate(vals, 1)
    ]


def test_cusum_verdict_classes_exact_values(spark):
    """Hand-computed table — baseline 10,12,14 gives mu=12, sigma=2
    exactly, so every statistic is halves and quarters (exact fp):
    walk jitter inside the 0.5-sigma allowance (OK, both sums 0),
    persistent +-2-sigma shifts (4.5 sigma > 4, ANOMALY both sides),
    both sigma=0 degradations, short series and NULL latest
    (NOT_READY; the NULL-latest row reports the stale walk stats)."""
    rows = (
        _series("p_ok", [10, 12, 14, 13, 11, 13])
        + _series("p_pos", [10, 12, 14, 16, 16, 16])
        + _series("p_neg", [10, 12, 14, 8, 8, 8])
        + _series("p_const_on", [42, 42, 42, 42, 42, 42])
        + _series("p_const_off", [7, 7, 7, 7, 7, 9])
        + [("r5", "p_short", 50.0, None), ("r6", "p_short", 51.0, None)]
        + _series("p_nulllatest", [50, 51, 52, 53, 54, None])
    )
    got = {
        r["part"]: r
        for r in _cusum(spark, rows).filter(F.col("metric") == "rows").collect()
    }
    ok = got["p_ok"]
    assert (ok["verdict"], ok["mu"], ok["sigma"]) == ("OK", 12.0, 2.0)
    assert (ok["cusum_pos"], ok["cusum_neg"]) == (0.0, 0.0)
    pos = got["p_pos"]
    assert (pos["verdict"], pos["cusum_pos"], pos["cusum_neg"]) == (
        "ANOMALY", 4.5, 0.0,
    )
    neg = got["p_neg"]
    assert (neg["verdict"], neg["cusum_pos"], neg["cusum_neg"]) == (
        "ANOMALY", 0.0, 4.5,
    )
    con = got["p_const_on"]
    assert (con["verdict"], con["sigma"], con["cusum_pos"]) == ("OK", 0.0, None)
    off = got["p_const_off"]
    assert (off["verdict"], off["cusum_pos"]) == ("ANOMALY", None)
    assert got["p_short"]["verdict"] == "NOT_READY"
    assert got["p_short"]["n_history"] == 2
    nl = got["p_nulllatest"]
    assert (nl["verdict"], nl["run_id"], nl["value"]) == ("NOT_READY", "r6", None)
    assert (nl["mu"], nl["sigma"], nl["cusum_pos"]) == (51.0, 1.0, 4.0)


def test_cusum_catches_small_persistent_drift_every_sibling_misses(spark):
    """THE niche: a +1.2-sigma level shift held for six runs. The step
    gate sees 0% run-over-run change, the whole-history median IS the
    shifted value, EWMA has converged onto it — all three say OK; only
    the integrating chart walks past its threshold."""
    from bigdime_spark.operators.outliers import metric_zscore

    vals = [100, 102, 98] + [102.4] * 6  # mu=100, sigma=2, d_pos=1.4/run
    rows = _series("p0", vals)
    c = _cusum(spark, rows).filter(F.col("metric") == "rows").first()
    assert c["verdict"] == "ANOMALY"
    assert c["cusum_pos"] == 4.2  # 6 * (2.4 - 1.0) / 2
    z = (
        metric_zscore(spark.createDataFrame(rows, SCHEMA), ["rows"])
        .filter(F.col("metric") == "rows")
        .first()
    )
    assert z["verdict"] == "OK"  # latest == median of its own history
    t = _trend(spark, rows).filter(F.col("metric") == "rows").first()
    assert t["verdict"] == "OK"  # zero step between identical runs


def test_cusum_threshold_strict_and_null_gap(spark):
    """cusum == h is OK (strict >); a NULL mid-walk value just
    shortens the walk — identical output to the same series with the
    run absent entirely."""
    vals = [10, 12, 14, 16, 16, 16]  # cusum_pos exactly 4.5
    rows = _series("p0", vals)
    at = _cusum(spark, rows, h_sigma=4.5).filter(F.col("metric") == "rows").first()
    assert at["verdict"] == "OK"
    above = _cusum(spark, rows, h_sigma=4.4).filter(F.col("metric") == "rows").first()
    assert above["verdict"] == "ANOMALY"
    gap = _series("p0", [10, 12, 14, 16, None, 16, 16])
    nogap = _series("p0", [10, 12, 14, 16, 16, 16])
    g = _cusum(spark, gap).filter(F.col("metric") == "rows").first()
    n = _cusum(spark, nogap).filter(F.col("metric") == "rows").first()
    for f in ("n_history", "mu", "sigma", "cusum_pos", "cusum_neg", "verdict"):
        assert g[f] == n[f], f


def test_cusum_refusals(spark):
    rows = _series("p0", [1, 2, 3, 4])
    with pytest.raises(ValueError, match="k_sigma"):
        _cusum(spark, rows, k_sigma=-0.1)
    with pytest.raises(ValueError, match="h_sigma"):
        _cusum(spark, rows, h_sigma=0)
    with pytest.raises(ValueError, match="baseline_n"):
        _cusum(spark, rows, baseline_n=1)
    with pytest.raises(ValueError, match="duplicate"):
        _cusum(spark, rows + [("r1", "p0", 9.0, None)]).collect()


def _ref_cusum(rows, k_sigma=0.5, h_sigma=4.0, baseline_n=3):
    """Independent pure-python reference using Page's ORIGINAL
    max(0, .) recursion — the closed prefix-sum/prefix-min form under
    test must agree with it."""
    from statistics import mean, stdev

    by_key: dict = {}
    for run, part, a, b in rows:
        for metric, v in (("rows", a), ("bytes", b)):
            by_key.setdefault((part, metric), []).append(
                (run, None if v is None else float(v))
            )
    out = {}
    for key, seq in by_key.items():
        seq.sort()
        latest = seq[-1][1]
        vals = [v for _, v in seq if v is not None]
        n = len(vals)
        mu = sigma = cpos = cneg = dev = None
        if n > baseline_n:
            base, walk = vals[:baseline_n], vals[baseline_n:]
            mu, sigma = mean(base), stdev(base)
            if sigma > 0:
                k = k_sigma * sigma
                cp = cn = 0.0
                for x in walk:
                    cp = max(0.0, cp + (x - mu - k))
                    cn = max(0.0, cn + (mu - x - k))
                cpos, cneg = cp / sigma, cn / sigma
            else:
                dev = max(abs(x - mu) for x in walk)
        if latest is None or n < baseline_n + 1:
            verdict = "NOT_READY"
        elif sigma > 0:
            verdict = "ANOMALY" if max(cpos, cneg) > h_sigma else "OK"
        else:
            verdict = "ANOMALY" if dev > 0 else "OK"
        out[key] = (n, mu, sigma, cpos, cneg, verdict)
    return out


@given(rows=history_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cusum_property_vs_python_reference(spark, rows):
    data = [
        (run, part, None if a is None else float(a),
         None if b is None else float(b))
        for run, part, a, b in rows
    ]
    got = {
        (r["part"], r["metric"]): r for r in _cusum(spark, data).collect()
    }
    ref = _ref_cusum(rows)
    assert set(got) == set(ref)
    for key, (n, mu, sigma, cpos, cneg, verdict) in ref.items():
        r = got[key]
        assert r["n_history"] == n, (key, dict(r.asDict()))
        for name, want in (
            ("mu", mu), ("sigma", sigma),
            ("cusum_pos", cpos), ("cusum_neg", cneg),
        ):
            if want is None:
                assert r[name] is None, (key, name, r[name])
            else:
                assert abs(r[name] - want) < 1e-5, (key, name, r[name], want)
        # recursion vs closed form may differ in the last fp bits; skip
        # the verdict assertion only on a knife-edge threshold hit
        knife = (
            sigma is not None and sigma > 0
            and abs(max(cpos, cneg) - 4.0) < 1e-9
        )
        if not knife:
            assert r["verdict"] == verdict, (key, dict(r.asDict()), ref[key])


def test_cli_trend_cusum_mode(spark, tmp_path_factory, capsys):
    """--cusum integrates a small persistent drift across five runs
    into exit 1 with mu/sigma/cusum_* in the worst rows; a flat walk
    exits 0; mode exclusion and a bad baseline exit 2."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("cusum")
    fx = build_fixture(spark, n_rows=32, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    assert cli.main(["run", "--raw", f"{d}/raw", "--out", f"{d}/o1",
                     "--run-id", "r0001"]) == 0
    s1 = spark.read.parquet(f"{d}/o1/stats")
    rows_t = dict(s1.dtypes)["stat__rows"]

    def stamped(i, delta):
        return s1.withColumn("run_id", F.lit(f"r{i:04d}")).withColumn(
            "stat__rows", (F.col("stat__rows") + delta).cast(rows_t)
        )

    # baseline jitter 0,+1,-1 -> mu = s, sigma = 1; then +2 held for
    # five runs -> cusum_pos = 5 * 1.5 = 7.5 sigma
    frames = [stamped(i, d_) for i, d_ in enumerate([0, 1, -1], 1)]
    drift = [stamped(i, 2) for i in range(4, 9)]
    hist = frames[0]
    for fr in frames[1:] + drift:
        hist = hist.unionByName(fr)
    hist.write.parquet(f"{d}/hist")
    capsys.readouterr()
    rc = cli.main(["trend", "--history", f"{d}/hist",
                   "--metrics", "stat__rows", "--cusum", "4.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["mode"] == "cusum"
    assert out["verdicts"]["ANOMALY"] == 2  # both parts drifted
    assert {"mu", "sigma", "cusum_pos", "cusum_neg"} <= set(out["worst"][0])
    assert out["worst"][0]["cusum_pos"] == 7.5
    # flat walk -> exit 0
    flat = [stamped(i, 0) for i in range(4, 9)]
    hok = frames[0]
    for fr in frames[1:] + flat:
        hok = hok.unionByName(fr)
    hok.write.parquet(f"{d}/hist_ok")
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist_ok",
                     "--metrics", "stat__rows", "--cusum", "4.0"]) == 0
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--cusum", "4.0",
                     "--zscore", "3.5"]) == 2
    capsys.readouterr()
    assert cli.main(["trend", "--history", f"{d}/hist",
                     "--metrics", "stat__rows", "--cusum", "4.0",
                     "--cusum-baseline", "1"]) == 2
