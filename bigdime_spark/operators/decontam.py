"""Benchmark decontamination: flag corpus documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard LLM-training hygiene pass (GPT-3 §C / Gopher-style
13-gram decontamination): any training document containing an n-gram
that also appears in an evaluation benchmark leaks test data into
training and must be dropped before the corpus ships.

Spark-first shape, sized for an asymmetric 10^12-doc corpus × small
(≤10^5-item) benchmark:

- benchmark grams: one pass over the benchmark → distinct gram frame
  (benchmark-sized, megabytes) → ``F.broadcast`` into the probe join,
  so the CORPUS SIDE NEVER SHUFFLES — the scan → gram explode →
  broadcast-hash-join pipeline is one mapper stage;
- per-doc gram arrays are built with the same ``zip_with``-fold
  Column expression as the dedup shingles (functions/text.
  word_ngram_array — JVM-side, tokenization evaluated once per row,
  whole-stage codegen; the explode is row-local);
- only MATCHED (doc, gram) rows reach the one hash-agg shuffle, and
  contamination is rare by construction, so the shuffle is a sliver
  of the corpus;
- the per-doc matched-gram sample is BOUNDED (row_number cap over the
  same clustering the aggregation needs — one exchange serves both),
  the same bounded-state discipline as dedup.MAX_GROUP_IDS: a
  document that is a verbatim benchmark copy must not materialize its
  entire gram set in one aggregation row. ``n_hits`` stays exact.

Output is CONTAMINATED DOCS ONLY (one row per flagged doc) — the
clean 99.9% of a 10^12-row corpus never appears in the result, which
is what makes the report collectable and the follow-up anti-join
cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdime_spark.functions.text import word_ngram_array
from bigdime_spark.operators.dedup import band_fingerprint

#: matched-gram sample cap per flagged doc (counts stay exact).
MAX_SAMPLE_GRAMS = 10


def word_gram_array(text: Column, n: int) -> Column:
    """Distinct word n-grams of ``text`` as an array<string> Column.

    Shares the dedup-shingle convention (dedup.word_ngram_shingles):
    a doc shorter than ``n`` tokens yields its whole text as one
    gram; a blank doc yields an empty array. Pure Column expression —
    no UDF, no shuffle; see functions/text.word_ngram_array for why
    it is zip_with-built rather than transform-over-sequence."""
    return word_ngram_array(text, n)


def benchmark_grams(
    bench: DataFrame, text_col: str, n: int = 8
) -> DataFrame:
    """Distinct word n-grams of the benchmark set → one-column
    ``(gram)`` frame. Benchmark-sized (its only shuffle is its own
    distinct), intended to ride a broadcast into the probe join."""
    return (
        bench.select(F.explode(word_gram_array(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_scan(
    docs: DataFrame,
    bench: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 8,
    min_hits: int = 1,
    max_sample: int = MAX_SAMPLE_GRAMS,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag corpus docs sharing ≥ ``min_hits`` word n-grams with the
    benchmark. → (id_col, n_grams, n_hits, hit_fraction,
    sample_grams_csv), contaminated docs only.

    ``n_grams`` = the doc's distinct gram count (computed from the
    array BEFORE the explode — row-local, no second pass);
    ``hit_fraction`` = n_hits / n_grams; ``sample_grams_csv`` = the
    ``max_sample`` lexicographically-smallest matched grams.

    ``broadcast_bench=False`` falls back to a plain shuffle join for
    the (unusual) case of a benchmark too large to broadcast —
    that shuffles the exploded corpus on ``gram`` and should be a
    deliberate choice."""
    bg = benchmark_grams(bench, bench_text_col or text_col, n)
    return _probe_gram_set(
        docs, bg, id_col=id_col, text_col=text_col, n=n,
        min_hits=min_hits, max_sample=max_sample, broadcast=broadcast_bench,
    )


def _probe_gram_set(
    docs: DataFrame,
    gram_frame: DataFrame,
    *,
    id_col: str,
    text_col: str,
    n: int,
    min_hits: int,
    max_sample: int,
    broadcast: bool,
) -> DataFrame:
    """Shared probe: per-doc hit stats against a one-column ``(gram)``
    frame. → (id_col, n_grams, n_hits, hit_fraction, sample_grams_csv),
    docs with ≥ ``min_hits`` matches only. The corpus side never
    shuffles when ``broadcast`` (the default): scan → gram explode →
    broadcast-hash-join is one mapper stage; only MATCHED rows reach
    the per-doc agg exchange."""
    grams = word_gram_array(F.col(text_col), n)
    base = docs.select(F.col(id_col).alias("_id"), grams.alias("_grams"))
    exploded = base.select(
        "_id", F.size("_grams").alias("n_grams"), F.explode("_grams").alias("gram")
    )

    gf = gram_frame.select("gram")
    if broadcast:
        gf = F.broadcast(gf)
    hits = exploded.join(gf, "gram")

    # one exchange on (_id, n_grams) serves the sample window AND the
    # final agg; collect_list skips the when() NULLs past the cap, so
    # the agg buffer holds ≤ max_sample grams however hot the doc.
    w = Window.partitionBy("_id", "n_grams").orderBy("gram")
    return (
        hits.withColumn("_rn", F.row_number().over(w))
        .groupBy("_id", "n_grams")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.array_join(
                F.sort_array(
                    F.collect_list(F.when(F.col("_rn") <= max_sample, F.col("gram")))
                ),
                ",",
            ).alias("sample_grams_csv"),
        )
        .filter(F.col("n_hits") >= min_hits)
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("hit_fraction"),
            "sample_grams_csv",
        )
    )


#: default cap on the hot-gram set (keeps it broadcastable: 10^5
#: grams × ~100 bytes ≈ 10 MB, well under the broadcast threshold).
MAX_HOT_GRAMS = 100_000


def hot_grams(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    max_hot: int | None = MAX_HOT_GRAMS,
) -> DataFrame:
    """Word n-grams shared by ≥ ``min_docs`` distinct documents →
    ``(gram, n_docs)``, the ``max_hot`` hottest (ties broken by gram
    ascending, fully deterministic).

    The INTRA-corpus duplication signal (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"):
    boilerplate, licence headers, templated spam and mirrored pages
    all surface as n-grams repeated across many documents — invisible
    to whole-doc dedup (C1) when the surrounding text differs.

    Scale shape: ``word_gram_array`` emits DISTINCT grams per doc
    (row-local Column expression), so ``count(*)`` per gram IS the
    distinct-doc count — no count-distinct state. The one shuffle
    carries (gram, partial count) pairs with map-side combine; the
    ``max_hot`` cap is a top-k (TakeOrderedAndProject: per-partition
    heap + driver merge of ``max_hot`` rows), never a full sort. The
    result is bounded and broadcastable by construction."""
    base = docs.select(word_gram_array(F.col(text_col), n).alias("_grams"))
    per = base.select(F.explode("_grams").alias("gram"))
    hot = (
        per.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    if max_hot is not None:
        hot = hot.orderBy(F.col("n_docs").desc(), F.col("gram").asc()).limit(max_hot)
    return hot


def duplicated_gram_scan(
    docs: DataFrame,
    hot: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    max_hot: int | None = MAX_HOT_GRAMS,
    min_hits: int = 1,
    max_sample: int = MAX_SAMPLE_GRAMS,
    broadcast_hot: bool = True,
) -> DataFrame:
    """Per-document duplicated-gram load: which docs are built from
    corpus-repeated n-grams, and how much of each doc is repeated.
    → (id_col, n_grams, n_hot, hot_fraction, sample_grams_csv),
    flagged docs only.

    Two passes over the corpus — pass 1 builds the bounded hot-gram
    set (``hot_grams``), pass 2 re-derives grams row-locally and
    probes the BROADCAST hot set — deliberately chosen over a single
    self-join pass: at 10^12 docs, two mapper-stage scans are far
    cheaper than shuffling the full exploded gram set twice for a
    gram×gram join. Pass ``hot=`` to reuse a precomputed/persisted
    hot-gram frame (e.g. from a previous snapshot). ``hot_fraction``
    near 1.0 = the doc is pure boilerplate; a corpus-wide rise in
    mean hot_fraction between snapshots is a template-flood signal."""
    if hot is None:
        hot = hot_grams(
            docs, text_col=text_col, n=n, min_docs=min_docs, max_hot=max_hot,
        )
    out = _probe_gram_set(
        docs, hot, id_col=id_col, text_col=text_col, n=n,
        min_hits=min_hits, max_sample=max_sample, broadcast=broadcast_hot,
    )
    return out.select(
        id_col,
        "n_grams",
        F.col("n_hits").alias("n_hot"),
        F.col("hit_fraction").alias("hot_fraction"),
        "sample_grams_csv",
    )


def drop_contaminated(
    docs: DataFrame, flagged: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Remove flagged docs from the corpus (anti-join on id). The
    flagged frame is report-sized; AQE turns this into a broadcast
    anti-join when it fits, so the corpus again avoids a shuffle."""
    return docs.join(
        flagged.select(F.col(id_col)).distinct(), id_col, "left_anti"
    )


# -------------------------------------------- image (phash) contamination

def phash_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    *,
    id_col: str = "image_id",
    phash_col: str = "phash",
    eval_id_col: str | None = None,
    eval_phash_col: str | None = None,
    bits: int = 64,
    k: int = 0,
    max_sample: int = MAX_SAMPLE_GRAMS,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Image-corpus benchmark decontamination: flag corpus rows whose
    perceptual ``phash`` is within hamming distance ≤ ``k`` of ANY
    image in a held-out evaluation set — the image twin of
    ``contamination_scan`` (an eval image leaking into training data
    survives re-encodes and resizes that break byte equality, but its
    phash moves only a few bits).

    Spark-first shape, sized for an asymmetric 10^12-image corpus ×
    small (≤10^6-item) eval set:

    - ``k == 0``: one broadcast-hash equality join on the fingerprint
      itself — the corpus side is a single mapper stage (scan →
      broadcast probe), no banding, no explode.
    - ``k ≥ 1``: pigeonhole banding (the shared
      ``dedup.band_fingerprint`` — any pair within distance k agrees
      exactly on ≥1 of the k+1 disjoint chunks, one code path for both
      the self-join and this probe). The corpus is banded with a ROW-LOCAL
      explode (k+1 rows per image, no shuffle), the eval bands ride a
      broadcast, and exact hamming is verified by
      ``bit_count(xor)`` after the join — so false band matches cost
      a codegen'd filter, never a shuffle.
    - only MATCHED (corpus, eval) rows reach the one per-image agg
      exchange, and contamination is rare by construction, so the
      shuffle is a sliver of the corpus (the C26 argument verbatim).

    The matched-eval-id sample is BOUNDED at ``max_sample`` via the
    row_number cap riding the same exchange the aggregation needs
    (dedup.MAX_GROUP_IDS discipline); ``n_eval_matches`` stays exact.
    NULL fingerprints on either side are excluded — marginal nullness
    is NotNull's business (B2/B15), not contamination's.

    ``broadcast_eval=False`` falls back to a shuffle join for an eval
    set too large to broadcast — a deliberate choice, as with
    ``contamination_scan``.

    → (id_col, n_eval_matches, min_hamming, sample_eval_ids_csv),
    contaminated corpus rows only."""
    if k < 0:
        raise ValueError(f"phash_contamination: k must be >= 0, got {k}")
    eid = eval_id_col or id_col
    efp = eval_phash_col or phash_col
    c = corpus.select(
        F.col(id_col).alias("_cid"), F.col(phash_col).cast("long").alias("_cfp")
    ).filter(F.col("_cfp").isNotNull())
    e = eval_set.select(
        F.col(eid).alias("_eid"), F.col(efp).cast("long").alias("_efp")
    ).filter(F.col("_efp").isNotNull()).distinct()

    if k == 0:
        ef = e
        if broadcast_eval:
            ef = F.broadcast(ef)
        matched = c.join(ef, c["_cfp"] == ef["_efp"]).select(
            "_cid", "_eid", F.lit(0).alias("_ham")
        )
    else:
        cb = band_fingerprint(c, "_cfp", bits=bits, k=k)
        eb = band_fingerprint(e, "_efp", bits=bits, k=k)
        if broadcast_eval:
            eb = F.broadcast(eb)
        matched = (
            cb.join(eb, ["ck", "cv"])
            .select(
                "_cid",
                "_eid",
                F.bit_count(F.col("_cfp").bitwiseXOR(F.col("_efp"))).alias("_ham"),
            )
            .filter(F.col("_ham") <= k)
            # a pair agreeing on several chunks matches several bands:
            # dedup before counting (matched sliver only — tiny shuffle)
            .distinct()
        )

    w_ = Window.partitionBy("_cid").orderBy("_eid")
    return (
        matched.withColumn("_rn", F.row_number().over(w_))
        .groupBy("_cid")
        .agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.min("_ham").alias("min_hamming"),
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("_rn") <= max_sample, F.col("_eid").cast("string"))
                    )
                ),
                ",",
            ).alias("sample_eval_ids_csv"),
        )
        .select(
            F.col("_cid").alias(id_col),
            "n_eval_matches",
            F.col("min_hamming").cast("int").alias("min_hamming"),
            "sample_eval_ids_csv",
        )
    )
