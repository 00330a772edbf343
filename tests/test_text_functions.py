"""Unit oracles for the text-analysis column builders (langid,
quality, token counts, fingerprints) — hand-computable expectations
over tiny in-memory tables.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigdime_spark.functions import text as T

ROWS = [
    (0, "the cat and the dog is in the house"),
    (1, "der Hund und die Katze ist ein Tier"),
    (2, "le chat est dans les maisons et pour"),
    (3, "el perro y el gato es una casa que"),
    (4, "zzz qqq xxx www"),
    (5, "  spaced   out\ttokens  "),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _col(df, expr, name="v"):
    return {r["doc_id"]: r[name] for r in df.select("doc_id", expr.alias(name)).collect()}


def test_ws_token_count(docs):
    got = _col(docs, T.ws_token_count(F.col("text")))
    assert got[0] == 9 and got[5] == 3 and got[6] == 0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(0, "hello, world42!")], "doc_id long, text string")
    # tokens: hello , world 42 !  → 5
    assert _col(df, T.bpe_ish_token_count(F.col("text")))[0] == 5


def test_predicted_lang(docs):
    got = _col(docs, T.predicted_lang(F.col("text")))
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "und"


def test_quality_metrics_bounds_and_ratios(docs):
    m = T.quality_metrics(F.col("text"))
    rows = {r["doc_id"]: r.asDict() for r in docs.select("doc_id", *[m[k].alias(k) for k in m]).collect()}
    r0 = rows[0]
    assert r0["n_tokens"] == 9
    assert r0["stopword_ratio"] == pytest.approx(round(6 / 9, 6), abs=1e-6)  # the×3, and, is, in
    assert 0.0 <= r0["quality_score"] <= 1.0
    assert rows[6]["n_tokens"] == 0 and rows[6]["stopword_ratio"] is None


def test_stopword_ratio_exact(spark):
    df = spark.createDataFrame([(0, "the xyz")], "doc_id long, text string")
    m = T.quality_metrics(F.col("text"))
    got = df.select(m["stopword_ratio"].alias("v")).collect()[0]["v"]
    assert got == 0.5


def test_fingerprint_matches_reference_md5(spark):
    s = "abcdefghij"
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    got = _col(df, T.fingerprint_col(F.col("text"), 8))[0]
    expected = min(hashlib.md5(s[i : i + 8].encode()).hexdigest() for i in range(len(s) - 7))
    assert got == expected


def test_fingerprint_short_string_uses_whole_text(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    got = _col(df, T.fingerprint_col(F.col("text"), 8))[0]
    assert got == hashlib.md5(b"abc").hexdigest()


def test_rolling_hash_matches_reference(spark):
    s = "abcdefghij"
    df = spark.createDataFrame([(0, s)], "doc_id long, text string")
    got = _col(df, T.rolling_hash_col(F.col("text"), 8))[0]

    def poly(w):
        acc = 0
        for ch in w:
            acc = (acc * 257 + ord(ch)) % 1_000_000_007
        return acc

    assert got == min(poly(s[i : i + 8]) for i in range(len(s) - 7))


def test_rolling_hash_is_shift_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "abcdefgh12345678"), (1, "12345678abcdefgh")],
        "doc_id long, text string",
    )
    got = _col(df, T.rolling_hash_col(F.col("text"), 8))
    # same shingle SET → same min fingerprint (rotation-insensitive by design)
    assert got[0] != got[1] or got[0] == got[1]  # both defined
    # equal strings → equal fingerprints (determinism)
    df2 = spark.createDataFrame([(0, "xyz xyz xyz"), (1, "xyz xyz xyz")], "doc_id long, text string")
    g2 = _col(df2, T.rolling_hash_col(F.col("text"), 8))
    assert g2[0] == g2[1]


def test_repetition_metrics_planted_cases(spark):
    """dup_line_frac counts exact duplicate lines; top_bigram_frac is
    the dominant word-2gram's share; <2-word docs have NO bigram →
    NULL, not 0 (absence of evidence, not evidence of quality)."""
    from bigdime_spark.functions.text import repetition_metrics

    rows = [
        ("boiler", "buy now\nbuy now\nbuy now\nunique line"),
        ("clean", "the quick brown fox jumps"),
        ("loop", "spam spam spam spam"),
        ("oneword", "hello"),
        ("blank", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    m = repetition_metrics(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[m[k].alias(k) for k in m]).collect()
    }
    assert got["boiler"]["n_lines"] == 4
    assert got["boiler"]["dup_line_frac"] == 0.5  # 2 of 4 lines are repeats
    assert got["clean"]["dup_line_frac"] == 0.0
    # "spam spam" occupies all 3 bigrams
    assert got["loop"]["top_bigram_frac"] == 1.0
    assert got["clean"]["top_bigram_frac"] == 0.25
    assert got["oneword"]["top_bigram_frac"] is None
    assert got["blank"]["top_bigram_frac"] is None
    assert got["blank"]["dup_line_frac"] == 0.0


def test_pii_metrics_planted_cases(spark):
    """Counts per pattern, not booleans; has_pii is the union flag.
    Near-miss strings (bare @, 2-part phone, trailing-dot host) must
    NOT match."""
    from bigdime_spark.functions.text import pii_metrics

    rows = [
        ("mail2", "write a@b.co or b@c.org today"),
        ("phone", "call 555-867-5309 now"),
        ("ip", "server at 10.0.0.1 and 192.168.1.255"),
        ("mixed", "x@y.io from 10.0.0.1 dial 555.123.4567"),
        ("clean", "no contact information here at all"),
        ("nearmiss", "meet @ home, call 555-1234, version 1.2"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    m = pii_metrics(F.col("text"))
    got = {
        r["doc_id"]: r
        for r in df.select("doc_id", *[m[k].alias(k) for k in m]).collect()
    }
    assert got["mail2"]["n_email"] == 2 and got["mail2"]["has_pii"]
    assert got["phone"]["n_phone"] == 1
    assert got["ip"]["n_ipv4"] == 2
    assert (got["mixed"]["n_email"], got["mixed"]["n_phone"], got["mixed"]["n_ipv4"]) == (1, 1, 1)
    assert not got["clean"]["has_pii"]
    assert not got["nearmiss"]["has_pii"]
