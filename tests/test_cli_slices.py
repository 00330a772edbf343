"""`run --slice-dims` end-to-end (C69 CLI wiring): violations planted
ONLY on one fmt segment must surface that segment as the top-lift
slice in <out>/slices and the run summary; flag misuse exits 2."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark import cli


def _run_cli(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr()
    lines = [ln for ln in out.out.strip().splitlines() if ln.startswith("{")]
    return rc, (json.loads(lines[-1]) if lines else None), out.err


@pytest.fixture(scope="module")
def slicefx(spark, tmp_path_factory):
    """Raw-only fixture where every caption NULL (not_null violation)
    sits on a pngz row — the pngz segment owns 100% of violations."""
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=240, n_parts=6, seed=7)
    d = str(tmp_path_factory.mktemp("slicefx"))
    raw = fx.raw.withColumn(
        "caption",
        F.when(
            (F.col("fmt") == "pngz") & (F.xxhash64("image_id") % 2 == 0),
            F.lit(None).cast("string"),
        ).otherwise(F.col("caption")),
    )
    raw.write.mode("overwrite").partitionBy("part").parquet(f"{d}/raw")
    return d


def test_run_slice_dims_end_to_end(spark, slicefx, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("sliceout"))
    rc, summary, _ = _run_cli(
        capsys,
        ["run", "--raw", f"{slicefx}/raw", "--out", out,
         "--run-id", "s1", "--slice-dims", "fmt", "--slice-pairs"],
    )
    assert rc == 1  # planted caption NULLs fail not_null
    assert summary["violations"] > 0

    slices = spark.read.parquet(f"{out}/slices")
    assert set(slices.columns) == {
        "dim", "value", "n", "n_viol", "viol_rate", "global_rate",
        "lift", "run_id",
    }
    rows = {(r["dim"], r["value"]): r for r in slices.collect()}
    assert all(r["run_id"] == "s1" for r in rows.values())
    # every violation is a pngz row → pngz lift = 1/frac(pngz) > 1,
    # every other fmt has zero violations (lift 0.0)
    pngz = rows[("fmt", "pngz")]
    assert pngz["n_viol"] == summary["violations"]
    assert pngz["lift"] is not None and pngz["lift"] > 1.0
    others = [
        r for (d, v), r in rows.items() if d == "fmt" and v != "pngz"
    ]
    assert others and all(r["n_viol"] == 0 and r["lift"] == 0.0 for r in others)
    # summary carries the same top segment
    assert summary["slice_top"]["dim"] == "fmt"
    assert summary["slice_top"]["value"] == "pngz"
    assert summary["slice_top"]["n_viol"] == pngz["n_viol"]

    # the no-Spark report rollup surfaces the same triage artifacts
    rc, rep, _ = _run_cli(capsys, ["report", "--out", out])
    assert rc == 0
    assert rep["top_slices"][0]["dim"] == "fmt"
    assert rep["top_slices"][0]["value"] == "pngz"
    assert rep["quarantined_parts"]  # planted failures quarantine parts


def test_run_slice_dims_clean_table_lift_null(spark, tmp_path_factory, capsys):
    """Zero violations → slices still written (segment sizes), every
    lift NULL, summary slice_top null, exit 0."""
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=120, n_parts=4, seed=11)
    d = str(tmp_path_factory.mktemp("cleanfx"))
    fx.raw.write.mode("overwrite").partitionBy("part").parquet(f"{d}/raw")
    out = str(tmp_path_factory.mktemp("cleanout"))
    rc, summary, _ = _run_cli(
        capsys,
        ["run", "--raw", f"{d}/raw", "--out", out, "--slice-dims", "fmt"],
    )
    assert rc == 0 and summary["violations"] == 0
    assert summary["slice_top"] is None
    slices = spark.read.parquet(f"{out}/slices").collect()
    assert slices and all(r["lift"] is None for r in slices)


def test_run_slice_dims_bad_column_exit2(slicefx, tmp_path_factory, capsys):
    out = str(tmp_path_factory.mktemp("badout"))
    rc, _, err = _run_cli(
        capsys,
        ["run", "--raw", f"{slicefx}/raw", "--out", out,
         "--slice-dims", "fmt,nope"],
    )
    assert rc == 2 and "nope" in err

    rc, _, err = _run_cli(
        capsys,
        ["run", "--raw", f"{slicefx}/raw", "--out", out,
         "--slice-dims", "fmt", "--slice-min-support", "0"],
    )
    assert rc == 2 and "slice-min-support" in err
