"""Caption text-quality gates (C75, operators/caption.
CaptionQualityBound): hand-computed per-part means, the verdict
classes, fused-agg alias sharing, and the suite/CLI surface. SQL-oracle
twin: `caption_quality_documents` in the driver contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators.base import fused_agg_exprs
from bigdime_spark.operators.caption import CaptionQualityBound


@pytest.fixture(scope="module")
def hand(spark):
    # pA: two clean 4-token captions + one NULL (excluded from means);
    # pB: digit soup (quality collapses); pC: only NULL captions
    rows = [
        ("pA", "a nice red cat"),
        ("pA", "two big blue dogs"),
        ("pA", None),
        ("pB", "1234 5678 9012"),
        ("pC", None),
    ]
    return spark.createDataFrame(rows, "part string, caption string")


def _fused(hand, bounds):
    return hand.groupBy("part").agg(*fused_agg_exprs(bounds))


def test_hand_means_and_verdicts(spark, hand):
    b_tok = CaptionQualityBound("n_tokens", lo=3.0)
    b_q = CaptionQualityBound("quality_score", lo=0.4)
    got = {
        r["part"]: r
        for r in _fused(hand, [b_tok, b_q])
        .select(
            "part",
            F.col(b_tok._avg).alias("mt"),
            b_tok.verdict_col().alias("v_tok"),
            b_q.verdict_col().alias("v_q"),
            b_q.observed_col().alias("obs_q"),
        )
        .collect()
    }
    assert got["pA"]["mt"] == 4.0 and got["pA"]["v_tok"] == "PASS"
    assert got["pB"]["v_tok"] == "PASS"  # 3 tokens
    # digit soup: digit_ratio 12/14 kills the score → quality FAILs
    assert got["pB"]["v_q"] == "FAIL"
    assert got["pA"]["v_q"] == "PASS"
    # all-NULL caption part: nothing to average → NOT_READY, not PASS
    assert got["pC"]["v_tok"] == "NOT_READY" and got["pC"]["v_q"] == "NOT_READY"
    assert got["pC"]["obs_q"] == "mean_quality_score=null"


def test_bounds_share_one_aggregate(spark, hand):
    lo = CaptionQualityBound("quality_score", lo=0.2)
    hi = CaptionQualityBound("quality_score", hi=0.9)
    exprs = fused_agg_exprs([lo, hi])
    assert len(exprs) == 1  # one shared avg buffer for both bounds
    row = _fused(hand, [lo, hi]).filter("part = 'pA'").first()
    assert row[lo._avg] is not None


def test_guards():
    with pytest.raises(ValueError, match="unsupported"):
        CaptionQualityBound("sentiment", lo=0.0)
    with pytest.raises(ValueError, match="lo, hi, or both"):
        CaptionQualityBound("n_tokens")
    with pytest.raises(ValueError, match="must be finite"):
        CaptionQualityBound("n_tokens", lo=float("nan"))
    with pytest.raises(ValueError, match="hi .* < lo"):
        CaptionQualityBound("n_tokens", lo=5.0, hi=1.0)


def test_suite_and_cli_end_to_end(spark, tmp_path_factory, capsys):
    from bigdime_spark import cli
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=120, n_parts=3, seed=9)
    # plant digit-soup captions on every p0001 row: quality collapses
    # there and only there
    raw = fx.raw.withColumn(
        "caption",
        F.when(F.col("part") == "p0001", F.lit("0123 4567 8901 2345")).otherwise(
            F.col("caption")
        ),
    )
    d = str(tmp_path_factory.mktemp("cqfx"))
    raw.write.mode("overwrite").partitionBy("part").parquet(f"{d}/raw")
    out = str(tmp_path_factory.mktemp("cqout"))
    rc = cli.main(
        ["run", "--raw", f"{d}/raw", "--out", out, "--run-id", "cq",
         "--caption-quality", "quality_score:0.3~"]
    )
    captured = capsys.readouterr()
    summary = json.loads(
        [ln for ln in captured.out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert rc == 1 and summary["parts_failed"] == 1
    verd = {
        r["part"]: r["verdict"]
        for r in spark.read.parquet(f"{out}/verdicts")
        .filter(F.col("constraint") == "caption_quality_quality_score.caption")
        .collect()
    }
    assert verd == {"p0000": "PASS", "p0001": "FAIL", "p0002": "PASS"}

    # malformed spec / unknown metric → operator-error contract
    rc2 = cli.main(
        ["run", "--raw", f"{d}/raw", "--out", out, "--caption-quality", "nope"]
    )
    err = capsys.readouterr().err
    assert rc2 == 2 and "caption-quality" in err
    rc3 = cli.main(
        ["run", "--raw", f"{d}/raw", "--out", out,
         "--caption-quality", "sentiment:0~1"]
    )
    err = capsys.readouterr().err
    assert rc3 == 2 and "unsupported" in err


# ------------------------------- C76: caption language-share gates


def test_lang_share_hand_table(spark):
    from bigdime_spark.operators.caption import CaptionLangShareBound

    rows = [
        ("pA", "the cat and the dog"),      # en markers
        ("pA", "the house is red"),         # en
        ("pA", "zzz qqq xxx"),              # no markers → und
        ("pB", "zzz qqq"), ("pB", "blorp"),  # all und
        ("pC", None),
    ]
    hand = spark.createDataFrame(rows, "part string, caption string")
    b_en = CaptionLangShareBound("en", lo=0.5)
    b_und = CaptionLangShareBound("und", hi=0.5)
    got = {
        r["part"]: r
        for r in hand.groupBy("part")
        .agg(*fused_agg_exprs([b_en, b_und]))
        .select(
            "part",
            F.col(b_en._k).alias("k_en"),
            F.col(b_en._n).alias("n"),
            b_en.verdict_col().alias("v_en"),
            b_und.verdict_col().alias("v_und"),
            b_und.observed_col().alias("obs_und"),
        )
        .collect()
    }
    assert got["pA"]["k_en"] == 2 and got["pA"]["n"] == 3
    assert got["pA"]["v_en"] == "PASS"  # 2/3 >= 0.5
    assert got["pA"]["v_und"] == "PASS"  # 1/3 <= 0.5
    assert got["pB"]["v_en"] == "FAIL" and got["pB"]["v_und"] == "FAIL"
    assert got["pB"]["obs_und"] == "share_und=1.0"
    assert got["pC"]["v_en"] == "NOT_READY"


def test_lang_share_guards():
    from bigdime_spark.operators.caption import CaptionLangShareBound

    with pytest.raises(ValueError, match="unsupported"):
        CaptionLangShareBound("xx", lo=0.5)
    with pytest.raises(ValueError, match="lo, hi, or both"):
        CaptionLangShareBound("en")
    with pytest.raises(ValueError, match="must be in \\[0, 1\\]"):
        CaptionLangShareBound("en", lo=1.5)
    with pytest.raises(ValueError, match="hi .* < lo"):
        CaptionLangShareBound("en", lo=0.9, hi=0.1)


def test_lang_share_cli_e2e(spark, tmp_path_factory, capsys):
    from bigdime_spark import cli
    from bigdime_spark.sources.synth import build_fixture

    fx = build_fixture(spark, n_rows=90, n_parts=3, seed=4)
    # p0002's captions become marker-free gibberish → und share 1.0
    raw = fx.raw.withColumn(
        "caption",
        F.when(F.col("part") == "p0002", F.lit("zzz qqq blorp")).otherwise(
            F.col("caption")
        ),
    )
    d = str(tmp_path_factory.mktemp("clfx"))
    raw.write.mode("overwrite").partitionBy("part").parquet(f"{d}/raw")
    out = str(tmp_path_factory.mktemp("clout"))
    rc = cli.main(
        ["run", "--raw", f"{d}/raw", "--out", out, "--run-id", "cl",
         "--caption-lang", "und:~0.5"]
    )
    capsys.readouterr()
    assert rc == 1
    verd = {
        r["part"]: r["verdict"]
        for r in spark.read.parquet(f"{out}/verdicts")
        .filter(F.col("constraint") == "caption_lang_und.caption")
        .collect()
    }
    assert verd["p0002"] == "FAIL"
    assert verd["p0000"] == "PASS" and verd["p0001"] == "PASS"

    rc2 = cli.main(
        ["run", "--raw", f"{d}/raw", "--out", out, "--caption-lang", "xx:0.5~"]
    )
    err = capsys.readouterr().err
    assert rc2 == 2 and "unsupported" in err
