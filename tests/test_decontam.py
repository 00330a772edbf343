"""Benchmark-decontamination oracles (operators/decontam): planted
contamination is found exactly, clean docs never appear, the matched-
gram sample is bounded, and the plan never shuffles the corpus side.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdime_spark.operators import decontam


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def corpus(spark):
    bench_rows = [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "pack my box with five dozen liquor jugs"),
    ]
    docs_rows = [
        # verbatim benchmark copy: every gram matches
        (1, "the quick brown fox jumps over the lazy dog"),
        # one leaked benchmark sentence inside an otherwise-clean doc
        (2, "intro words here pack my box with five dozen liquor jugs and more"),
        # clean: shares words but no 3-gram
        (3, "quick dog fox brown lazy jumps box my pack"),
        # clean, unrelated
        (4, "completely unrelated text about spark plans and shuffles"),
        # blank
        (5, "   "),
        # shorter than n tokens: whole-text gram, no match
        (6, "two words"),
    ]
    bench = spark.createDataFrame(bench_rows, ["doc_id", "text"])
    docs = spark.createDataFrame(docs_rows, ["doc_id", "text"])
    return docs, bench


def test_planted_contamination_found_exactly(spark, corpus):
    docs, bench = corpus
    out = decontam.contamination_scan(docs, bench, n=3)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2}
    # doc 1 is a verbatim copy: all 7 of its 3-grams match
    assert got[1]["n_grams"] == 7
    assert got[1]["n_hits"] == 7
    assert got[1]["hit_fraction"] == 1.0
    # doc 2 leaked one 8-token sentence → 6 matching 3-grams
    assert got[2]["n_hits"] == 6
    assert 0 < got[2]["hit_fraction"] < 1
    # sample grams are real matched grams, sorted ascending
    sample = got[2]["sample_grams_csv"].split(",")
    assert sample == sorted(sample)
    assert "pack my box" in sample


def test_min_hits_threshold(spark, corpus):
    docs, bench = corpus
    out = decontam.contamination_scan(docs, bench, n=3, min_hits=7)
    assert [r["doc_id"] for r in out.collect()] == [1]


def test_sample_bounded_counts_exact(spark, corpus):
    docs, bench = corpus
    out = decontam.contamination_scan(docs, bench, n=3, max_sample=2)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_hits"] == 7  # count stays exact past the cap
    assert len(got[1]["sample_grams_csv"].split(",")) == 2
    # the bounded sample is the lexicographically-smallest matched grams
    full = decontam.contamination_scan(docs, bench, n=3)
    all_grams = {
        r["doc_id"]: r["sample_grams_csv"].split(",") for r in full.collect()
    }
    assert got[1]["sample_grams_csv"].split(",") == sorted(all_grams[1])[:2]


def test_empty_benchmark_flags_nothing(spark, corpus):
    docs, bench = corpus
    out = decontam.contamination_scan(docs, bench.filter(F.lit(False)), n=3)
    assert out.count() == 0


def test_drop_contaminated_removes_only_flagged(spark, corpus):
    docs, bench = corpus
    flagged = decontam.contamination_scan(docs, bench, n=3)
    clean = decontam.drop_contaminated(docs, flagged)
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4, 5, 6]


def test_plan_corpus_side_never_shuffles(spark, corpus):
    """100-TB shape assertion: the corpus scan reaches the probe join
    through a BroadcastHashJoin with no Exchange beneath it; the only
    hash exchanges are the benchmark distinct and the matched-subset
    window/agg (which share one clustering)."""
    docs, bench = corpus
    out = decontam.contamination_scan(docs, bench, n=3)
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan
    # formatted plans name each node in the tree and once in the
    # details; count distinct node ids instead of raw occurrences.
    exchanges = set(re.findall(r"\((\d+)\) Exchange", plan))
    broadcasts = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    assert len(broadcasts) == 1, plan
    assert len(exchanges - broadcasts) <= 2, plan


def test_broadcast_off_falls_back_to_shuffle_join(spark, corpus):
    docs, bench = corpus
    out = decontam.contamination_scan(docs, bench, n=3, broadcast_bench=False)
    assert {r["doc_id"] for r in out.collect()} == {1, 2}


def test_decontam_cli_end_to_end(spark, corpus, tmp_path_factory, capsys):
    import json

    from bigdime_spark import cli

    docs, bench = corpus
    d = str(tmp_path_factory.mktemp("decontam"))
    docs.write.parquet(f"{d}/docs")
    bench.write.parquet(f"{d}/bench")
    rc = cli.main(
        ["decontam", "--input", f"{d}/docs", "--bench", f"{d}/bench",
         "--out", f"{d}/out", "--n", "3", "--drop"]
    )
    out = capsys.readouterr().out
    summary = json.loads(
        [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert rc == 0
    assert summary["flagged"] == 2
    assert summary["hits_total"] == 13
    assert summary["clean_rows"] == 4
    flagged = spark.read.parquet(f"{d}/out/flagged")
    assert {r["doc_id"] for r in flagged.collect()} == {1, 2}
    clean = spark.read.parquet(f"{d}/out/clean")
    assert sorted(r["doc_id"] for r in clean.collect()) == [3, 4, 5, 6]


# =====================================================================
# Intra-corpus hot grams / duplicated-gram scan (Lee et al. 2022 signal)
# =====================================================================

BOILER = "all rights reserved by example corp"
BOILER_GRAMS = [
    "all rights reserved",
    "by example corp",
    "reserved by example",
    "rights reserved by",
]


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    rows = [
        (1, f"unique alpha one {BOILER}"),       # 7 grams, 4 hot
        (2, f"beta two {BOILER}"),                # 6 grams, 4 hot
        (3, BOILER),                              # 4 grams, all hot
        (4, "totally unique document nothing repeated here"),
        (5, "another fully unique text body"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_hot_grams_exact(spark, boiler_corpus):
    out = decontam.hot_grams(boiler_corpus, n=3, min_docs=3)
    got = {r["gram"]: r["n_docs"] for r in out.collect()}
    assert got == {g: 3 for g in BOILER_GRAMS}


def test_hot_grams_cap_deterministic_tiebreak(spark, boiler_corpus):
    """All four hot grams tie at n_docs=3; the cap must keep the
    lexicographically smallest — deterministically, every run."""
    out = decontam.hot_grams(boiler_corpus, n=3, min_docs=3, max_hot=2)
    got = sorted(r["gram"] for r in out.collect())
    assert got == ["all rights reserved", "by example corp"]


def test_duplicated_gram_scan_flags_boilerplate(spark, boiler_corpus):
    out = decontam.duplicated_gram_scan(boiler_corpus, n=3, min_docs=3)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["n_grams"] == 7 and got[1]["n_hot"] == 4
    assert got[1]["hot_fraction"] == round(4 / 7, 6)
    # the pure-boilerplate doc is wholly built from repeated grams
    assert got[3]["hot_fraction"] == 1.0
    sample = got[3]["sample_grams_csv"].split(",")
    assert sample == sorted(BOILER_GRAMS)


def test_duplicated_gram_scan_reuses_precomputed_hot(spark, boiler_corpus):
    hot = decontam.hot_grams(boiler_corpus, n=3, min_docs=3)
    a = decontam.duplicated_gram_scan(boiler_corpus, n=3, min_docs=3)
    b = decontam.duplicated_gram_scan(boiler_corpus, hot, n=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_duplicated_gram_scan_plan_probe_is_broadcast(spark, boiler_corpus):
    """100-TB shape: pass 2's probe join is a BroadcastHashJoin — the
    corpus side reaches it straight from the scan with no Exchange
    beneath (the only hash exchanges are pass 1's gram count and the
    matched-subset window/agg clustering)."""
    out = decontam.duplicated_gram_scan(boiler_corpus, n=3, min_docs=3)
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan
    broadcasts = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    exchanges = set(re.findall(r"\((\d+)\) Exchange", plan))
    assert len(broadcasts) == 1, plan
    assert len(exchanges - broadcasts) <= 3, plan


# ------------------- gram-builder property (hypothesis)

from hypothesis import given, settings, strategies as st  # noqa: E402

from bigdime_spark.functions.text import word_ngram_array  # noqa: E402

_word = st.text(
    alphabet="abcxyz019", min_size=1, max_size=6
)


def _ref_grams(words: list[str], n: int) -> set[str]:
    """Python reference of the gram contract: distinct word n-grams;
    whole text as one gram when shorter than n tokens; empty for
    blank text; '' never emitted."""
    if not words:
        return set()
    if len(words) < n:
        return {" ".join(words)} - {""}
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)} - {""}


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(st.lists(_word, min_size=0, max_size=12), min_size=1, max_size=6),
    n=st.integers(1, 5),
)
def test_word_ngram_array_matches_python_reference(spark, docs, n):
    """The zip_with-fold gram builder must agree with the naive
    Python n-gram definition on every doc — the rewrite that removed
    the per-element re-tokenization may not change a single gram."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: set(r["g"])
        for r in df.select(
            "doc_id", word_ngram_array(F.col("text"), n).alias("g")
        ).collect()
    }
    for i, ws in enumerate(docs):
        assert got[i] == _ref_grams(ws, n), (ws, n)


# ------------------------------------------- image (phash) contamination


@pytest.fixture(scope="module")
def image_eval(spark):
    base = 0x5A5A_1234_ABCD_0F0F
    corpus_rows = [
        ("img-exact", base),                 # hamming 0 vs E0
        ("img-ham1", base ^ (1 << 62)),      # hamming 1 in the top chunk
        ("img-ham2", base ^ 0b11),           # hamming 2
        ("img-ham3", base ^ 0b111),          # hamming 3: excluded at k=2
        ("img-far", ~base & 0x7FFF_FFFF_FFFF_FFFF),  # unrelated
        ("img-null", None),                  # NULL fp: excluded, never errors
    ]
    eval_rows = [("E0", base), ("E-null", None)]
    corpus = spark.createDataFrame(corpus_rows, "image_id string, phash long")
    ev = spark.createDataFrame(eval_rows, "image_id string, phash long")
    return corpus, ev


def test_phash_contamination_planted_exact(spark, image_eval):
    corpus, ev = image_eval
    out = decontam.phash_contamination(corpus, ev, bits=64, k=2)
    got = {r["image_id"]: r for r in out.collect()}
    assert set(got) == {"img-exact", "img-ham1", "img-ham2"}
    assert got["img-exact"]["min_hamming"] == 0
    assert got["img-ham1"]["min_hamming"] == 1
    assert got["img-ham2"]["min_hamming"] == 2
    for r in got.values():
        assert r["n_eval_matches"] == 1
        assert r["sample_eval_ids_csv"] == "E0"


def test_phash_contamination_k0_is_exact_match_only(spark, image_eval):
    corpus, ev = image_eval
    out = decontam.phash_contamination(corpus, ev, bits=64, k=0)
    got = {r["image_id"] for r in out.collect()}
    assert got == {"img-exact"}


def test_phash_contamination_sample_bounded_counts_exact(spark):
    fp = 0x0123_4567_89AB_CDEF
    corpus = spark.createDataFrame([("hot", fp)], "image_id string, phash long")
    ev = spark.createDataFrame(
        [(f"E{i:02d}", fp) for i in range(25)], "image_id string, phash long"
    )
    row = decontam.phash_contamination(
        corpus, ev, bits=64, k=0, max_sample=10
    ).collect()[0]
    assert row["n_eval_matches"] == 25  # count stays exact past the cap
    sample = row["sample_eval_ids_csv"].split(",")
    assert len(sample) == 10
    # rn orders by eval id ascending, so the sample is E00..E09
    assert sample == [f"E{i:02d}" for i in range(10)]


def test_phash_contamination_plan_no_corpus_shuffle(spark, image_eval):
    """100-TB shape: the banded corpus reaches the probe join straight
    from the scan (row-local explode) through a BroadcastHashJoin;
    the only hash exchanges act on the MATCHED sliver (pair distinct
    + per-image window/agg)."""
    corpus, ev = image_eval
    out = decontam.phash_contamination(corpus, ev, bits=64, k=2)
    plan = _explain(out)
    assert "BroadcastHashJoin" in plan
    exchanges = set(re.findall(r"\((\d+)\) Exchange", plan))
    broadcasts = set(re.findall(r"\((\d+)\) BroadcastExchange", plan))
    assert len(broadcasts) == 1, plan
    assert len(exchanges - broadcasts) <= 3, plan


def test_phash_contamination_negative_k_raises(spark, image_eval):
    corpus, ev = image_eval
    with pytest.raises(ValueError, match="k must be >= 0"):
        decontam.phash_contamination(corpus, ev, k=-1)


def test_phash_contamination_drop_composes(spark, image_eval):
    corpus, ev = image_eval
    flagged = decontam.phash_contamination(corpus, ev, bits=64, k=2)
    clean = decontam.drop_contaminated(corpus, flagged, id_col="image_id")
    assert {r["image_id"] for r in clean.collect()} == {
        "img-ham3", "img-far", "img-null"
    }


# ----------------------------------------------- repeated spans (C67)

@pytest.fixture(scope="module")
def span_corpus(spark):
    rows = [
        # 10/11 bracket the island-merge boundary: both carry the two
        # shared 3-grams "red green blue" and "cyan magenta yellow";
        # in 10 the flagged positions are {1, 5} (gap 4 = n+1 → two
        # spans), in 11 they are {1, 4} (gap 3 = n → one merged span).
        (10, "red green blue pad cyan magenta yellow"),
        (11, "red green blue cyan magenta yellow"),
        (12, "red green blue"),
        (13, "cyan magenta yellow"),
        # clean: no cross-doc 3-gram
        (14, "completely different words here entirely"),
        # blank and sub-n docs: no positional grams at all
        (15, "   "),
        (16, "two words"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _span_set(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_words"], r["n_grams"])
        for r in df.collect()
    }


def test_repeated_spans_islands_merge_at_gap_n(spark, span_corpus):
    got = _span_set(decontam.repeated_spans(span_corpus, n=3, min_docs=2))
    assert got == {
        (10, 1, 3, 3, 1),
        (10, 5, 7, 3, 1),
        (11, 1, 6, 6, 2),  # gap == n bridges into ONE maximal span
        (12, 1, 3, 3, 1),
        (13, 1, 3, 3, 1),
    }


def test_repeated_spans_hash_mode_matches_string_mode(spark, span_corpus):
    s = _span_set(decontam.repeated_spans(span_corpus, n=3, min_docs=2))
    h = _span_set(
        decontam.repeated_spans(span_corpus, n=3, min_docs=2, hash_grams=True)
    )
    assert s == h


def test_span_coverage_one_row_per_doc_with_zeros(spark, span_corpus):
    cov = {r["doc_id"]: r for r in decontam.span_coverage(
        span_corpus, n=3, min_docs=2
    ).collect()}
    assert set(cov) == {10, 11, 12, 13, 14, 15, 16}
    assert cov[11]["n_spans"] == 1 and cov[11]["dup_words"] == 6
    assert cov[11]["dup_fraction"] == 1.0  # the whole doc is repeated text
    assert cov[10]["dup_words"] == 6 and cov[10]["n_words"] == 7
    assert cov[14]["n_spans"] == 0 and cov[14]["dup_fraction"] == 0.0
    assert cov[15]["n_words"] == 0 and cov[15]["dup_fraction"] == 0.0
    assert cov[16]["n_spans"] == 0


def test_span_coverage_reuses_precomputed_spans(spark, span_corpus):
    spans = decontam.repeated_spans(span_corpus, n=3, min_docs=2)
    a = decontam.span_coverage(span_corpus, spans, n=3, min_docs=2)
    b = decontam.span_coverage(span_corpus, n=3, min_docs=2)
    assert _sorted_rows(a) == _sorted_rows(b)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _py_repeated_spans(rows, n, min_docs):
    """Pure-python reference: positional grams, cross-doc df filter,
    gaps-and-islands merge."""
    toks = {i: t.strip().split() if t.strip() else [] for i, t in rows}
    pos = {
        i: [
            (p + 1, " ".join(ts[p : p + n]))
            for p in range(max(len(ts) - n + 1, 0))
        ]
        for i, ts in toks.items()
    }
    df = {}
    for i, grams in pos.items():
        for g in {g for _, g in grams}:
            df[g] = df.get(g, 0) + 1
    rep = {g for g, c in df.items() if c >= min_docs}
    out = set()
    for i, grams in pos.items():
        ps = sorted(p for p, g in grams if g in rep)
        if not ps:
            continue
        start = prev = ps[0]
        cnt = 1
        for p in ps[1:]:
            if p - prev <= n:
                prev = p
                cnt += 1
            else:
                out.add((i, start, prev + n - 1, prev + n - start, cnt))
                start = prev = p
                cnt = 1
        out.add((i, start, prev + n - 1, prev + n - start, cnt))
    return out


def test_repeated_spans_matches_python_reference_on_random_docs(spark):
    import random

    rng = random.Random(41)
    vocab = [f"w{j}" for j in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _span_set(decontam.repeated_spans(df, n=3, min_docs=2))
    assert got == _py_repeated_spans(rows, 3, 2)


def test_repeated_spans_plan_broadcast_rep_and_doc_partitioned_window(
    spark, span_corpus
):
    df = decontam.repeated_spans(span_corpus, n=3, min_docs=2, broadcast_rep=True)
    plan = _explain(df)
    assert "BroadcastHashJoin" in plan
    # the islands window rides hash(doc id), never a global sort
    assert "Window" in plan
    assert "SinglePartition" not in plan
