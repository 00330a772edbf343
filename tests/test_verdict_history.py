"""Cross-run verdict history / flakiness profile
(plans/lineage.verdict_history + CLI `history`). The SQL-oracle twin
is `verdict_history_orders` in the driver contract; these tests pin
the semantics on explicit histories and the CLI exit contract.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli
from bigdime_spark.plans.lineage import verdict_history

SCHEMA = "run_id string, part string, constraint string, verdict string"


def _hist(spark, rows):
    return verdict_history(spark.createDataFrame(rows, SCHEMA))


def test_every_status_class(spark):
    rows = []
    patterns = {
        "stable_pass": ["PASS", "PASS", "PASS"],
        "stable_fail": ["FAIL", "FAIL", "FAIL"],
        "stable_other": ["NOT_READY", "NOT_READY", "NOT_READY"],
        "regressed": ["PASS", "PASS", "FAIL"],
        "recovered": ["FAIL", "PASS", "PASS"],
        "changed": ["NOT_READY", "PASS", "PASS"],
        "flaky": ["PASS", "FAIL", "PASS"],
    }
    for status, verdicts in patterns.items():
        for i, v in enumerate(verdicts, start=1):
            rows.append((f"r{i}", "p0", status, v))
    out = {r["constraint"]: r for r in _hist(spark, rows).collect()}
    for status in patterns:
        r = out[status]
        assert r["status"] == status, (status, r)
        assert r["n_runs"] == 3
    assert out["flaky"]["n_transitions"] == 2
    assert out["regressed"]["last_verdict"] == "FAIL"
    assert out["recovered"]["first_verdict"] == "FAIL"
    assert out["stable_pass"]["n_pass"] == 3
    assert out["stable_fail"]["n_fail"] == 3


def test_single_run_is_stable(spark):
    out = _hist(spark, [("r1", "p0", "c", "FAIL")]).collect()
    assert len(out) == 1
    assert out[0]["status"] == "stable_fail"
    assert out[0]["n_transitions"] == 0


def test_run_order_is_lexicographic(spark):
    # rows arrive shuffled; the window orders by run_id, so the
    # transition structure is the r1<r2<r3 one regardless
    rows = [("r3", "p", "c", "FAIL"), ("r1", "p", "c", "PASS"), ("r2", "p", "c", "PASS")]
    r = _hist(spark, rows).collect()[0]
    assert r["status"] == "regressed"
    assert (r["first_verdict"], r["last_verdict"]) == ("PASS", "FAIL")


def test_refusals(spark):
    with pytest.raises(ValueError, match="duplicate"):
        _hist(
            spark,
            [("r1", "p", "c", "PASS"), ("r1", "p", "c", "FAIL")],
        ).collect()
    with pytest.raises(ValueError, match="no columns"):
        verdict_history(spark.createDataFrame([("p", "c")], "part string, constraint string"))


def test_cli_history_exit_codes(spark, tmp_path_factory, capsys):
    d = tmp_path_factory.mktemp("hist")
    flaky = [
        ("r1", "p0", "checksum", "PASS"),
        ("r2", "p0", "checksum", "FAIL"),
        ("r3", "p0", "checksum", "PASS"),
        ("r1", "p1", "checksum", "PASS"),
        ("r2", "p1", "checksum", "PASS"),
        ("r3", "p1", "checksum", "PASS"),
    ]
    spark.createDataFrame(flaky, SCHEMA).write.parquet(f"{d}/bad")
    rc = cli.main(["history", "--verdicts", f"{d}/bad"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1
    assert out["statuses"] == {"flaky": 1, "stable_pass": 1}
    assert out["worst"][0]["part"] == "p0"
    assert out["worst"][0]["status"] == "flaky"

    clean = [r for r in flaky if r[1] == "p1"]
    spark.createDataFrame(clean, SCHEMA).write.parquet(f"{d}/good")
    assert cli.main(["history", "--verdicts", f"{d}/good"]) == 0
    capsys.readouterr()

    # operator-error contract: a frame without run_id exits 2
    spark.createDataFrame(
        [("p", "c", "PASS")], "part string, constraint string, verdict string"
    ).write.parquet(f"{d}/short")
    assert cli.main(["history", "--verdicts", f"{d}/short"]) == 2
    assert "no columns" in capsys.readouterr().err


def test_run_cli_stamps_run_id(spark, tmp_path_factory):
    """Written verdicts carry the run_id so many runs' outputs union
    into the history shape."""
    from bigdime_spark.sources.synth import build_fixture
    from bigdime_spark.sources.tables import write_table

    d = tmp_path_factory.mktemp("stamp")
    fx = build_fixture(spark, n_rows=16, n_parts=2)
    write_table(fx.raw, f"{d}/raw")
    rc = cli.main([
        "run", "--raw", f"{d}/raw", "--out", f"{d}/out", "--run-id", "r0001",
    ])
    assert rc == 0
    v = spark.read.parquet(f"{d}/out/verdicts")
    assert {r["run_id"] for r in v.select("run_id").distinct().collect()} == {"r0001"}
    # and the written frame feeds verdict_history directly
    assert verdict_history(v).count() > 0
