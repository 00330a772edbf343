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


# ------------------------------------------------- repeated spans (C67)

def positional_word_grams(text: Column, n: int) -> Column:
    """ALL word n-grams of ``text`` in position order as an
    array<string> Column — element i (0-based) is the gram starting at
    token i+1. Unlike functions/text.word_ngram_array there is no
    per-doc distinct and no whole-text fallback: a span needs real
    token positions, and a doc shorter than ``n`` tokens has no
    n-gram, so it yields an empty array.

    Same zip_with fold as word_ngram_array (the tokenization is
    evaluated once per row at the top level of one projection — see
    that docstring for the transform-over-sequence pitfall this
    avoids); ``zip_with`` null-pads the shorter side, so the trailing
    ``n-1`` partially-formed elements are NULL-concat NULLs and the
    final slice drops them."""
    from bigdime_spark.functions.text import tokens_col

    toks = tokens_col(text)
    if n <= 1:
        return toks
    acc = toks
    for k in range(1, n):
        rest = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(1)))
        acc = F.zip_with(acc, rest, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(
        F.size(toks) < F.lit(n), F.array().cast("array<string>")
    ).otherwise(F.slice(acc, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1))))


def repeated_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
    hash_grams: bool = False,
    broadcast_rep: bool = False,
) -> DataFrame:
    """Maximal cross-document repeated spans — WHERE in each doc the
    corpus-duplicated text sits, as 1-based token ranges.
    → (id_col, span_start, span_end, span_words, n_grams), one row per
    maximal span; docs with no repeated gram never appear.

    This is the REMOVAL step of exact-substring dedup (Lee et al.
    2022): hot_grams/duplicated_gram_scan say WHICH docs carry
    duplicated text and HOW MUCH; this says WHERE, so a curation pass
    can excise the spans (or drop docs whose coverage is high — see
    span_coverage) instead of discarding whole documents. A token
    position is flagged when its n-gram starting there appears in
    ≥ ``min_docs`` DISTINCT documents; flagged positions whose gram
    windows touch or overlap (gap ≤ n tokens) merge into one maximal
    span [min_p, max_p + n - 1] — standard gaps-and-islands over the
    per-doc position sequence.

    Scale shape (10^12 docs):
    - pass 1 (gram document-frequency): per-doc DISTINCT grams are
      built row-locally (array_distinct before the explode), so
      ``count(*)`` per gram IS the distinct-doc count — one hash-agg
      shuffle with map-side combine, no count-distinct state;
    - the repeated-gram set is NOT boundable (unlike the top-k hot
      set) — every repeated gram matters — so pass 2 is a shuffle
      semi-join of the positional frame against it on the gram key.
      ``hash_grams=True`` shuffles xxhash64(gram) 8-byte keys instead
      of gram strings in BOTH passes (~10× fewer shuffle bytes at
      n=13; a 64-bit collision can only over-flag a position —
      acceptable for curation, keep strings for an exact audit);
      ``broadcast_rep=True`` broadcasts the repeated set when the
      caller knows it is small (templated corpora, high min_docs);
    - the islands window partitions by doc id — per-doc state only,
      bounded by doc length, never a global sort.
    """
    grams_arr = positional_word_grams(F.col(text_col), n)
    key = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    pos = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(grams_arr).alias("_p0", "_gram"),
    ).select(
        "_id", (F.col("_p0") + 1).cast("long").alias("_p"), key(F.col("_gram")).alias("_g")
    )
    dfreq = docs.select(
        F.explode(F.array_distinct(grams_arr)).alias("_gram")
    ).select(key(F.col("_gram")).alias("_g"))
    rep = (
        dfreq.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= F.lit(min_docs))
        .select("_g")
    )
    if broadcast_rep:
        rep = F.broadcast(rep)
    flagged = pos.join(rep, "_g", "left_semi").select("_id", "_p")
    w = Window.partitionBy("_id").orderBy("_p")
    isl = (
        flagged.withColumn(
            "_brk",
            F.when(F.col("_p") - F.lag("_p").over(w) <= F.lit(n), F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("_isl", F.sum("_brk").over(w))
    )
    return (
        isl.groupBy("_id", "_isl")
        .agg(
            F.min("_p").alias("span_start"),
            (F.max("_p") + F.lit(n - 1)).alias("span_end"),
            (F.max("_p") + F.lit(n) - F.min("_p")).alias("span_words"),
            F.count(F.lit(1)).alias("n_grams"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            F.col("span_words").cast("long").alias("span_words"),
            F.col("n_grams").cast("long").alias("n_grams"),
        )
    )


def span_coverage(
    docs: DataFrame,
    spans: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
    hash_grams: bool = False,
    broadcast_rep: bool = False,
) -> DataFrame:
    """Per-document repeated-span coverage — the drop/keep signal of
    substring dedup. → (id_col, n_words, n_spans, dup_words,
    dup_fraction), ONE ROW PER DOC (clean docs carry zeros): coverage
    is a curation column every doc needs, like a sampling score, not
    a violations report. ``dup_fraction`` near 1.0 = the doc is pure
    corpus boilerplate; Lee et al. drop above a threshold and keep
    one canonical copy via the dedup family.

    Pass ``spans=`` to reuse a precomputed repeated_spans frame; the
    rollup is one hash agg on the doc id plus a corpus-side left join
    that AQE plans as broadcast when the flagged set is small."""
    from bigdime_spark.functions.text import ws_token_count

    if spans is None:
        spans = repeated_spans(
            docs, id_col=id_col, text_col=text_col, n=n, min_docs=min_docs,
            hash_grams=hash_grams, broadcast_rep=broadcast_rep,
        )
    per = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_words").alias("dup_words"),
    )
    base = docs.select(
        F.col(id_col),
        ws_token_count(F.col(text_col)).cast("long").alias("n_words"),
    )
    joined = base.join(per, id_col, "left")
    return joined.select(
        id_col,
        "n_words",
        F.coalesce(F.col("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
        F.coalesce(F.col("dup_words"), F.lit(0)).cast("long").alias("dup_words"),
        F.when(
            F.col("n_words") > 0,
            F.coalesce(F.col("dup_words"), F.lit(0)).cast("double") / F.col("n_words"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_fraction"),
    )
