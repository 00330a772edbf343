"""Text-analysis column builders for training-data pipelines.

Language-ID (marker-token heuristic), quality scoring (length /
punctuation / stopword ratios), token counting (whitespace + a
BPE-ish regex), and document fingerprinting. All pure Column
expressions (JVM-side, whole-stage codegen — no UDFs), so they run
at 100 TB scale inside a single scan and are expressible 1:1 in the
DuckDB oracle SQL (`__spark_entry__.oracle_sql`).

Every function that yields a float rounds explicitly: the driver's
correctness gate hashes values, so Spark and the SQL oracle must
produce bit-identical output.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny multilingual marker lists for the n-gram/stopword language heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr": ("le", "les", "et", "est", "une", "dans", "pour"),
    "es": ("el", "los", "y", "es", "una", "que", "por"),
}
#: deterministic tie-break order (first wins on equal score)
LANG_ORDER = ("en", "de", "fr", "es")

ENGLISH_STOPWORDS = ("the", "a", "of", "and", "is", "to", "in", "that", "it", "for")

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}-]"


def tokens_col(c: Column) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def ws_token_count(c: Column) -> Column:
    """Whitespace token count (0 for blank/empty text)."""
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(F.split(F.trim(c), r"\s+")))


def bpe_ish_token_count(c: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def _count_in_list(tokens: Column, words: tuple[str, ...]) -> Column:
    lits = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(lits, F.lower(x))))


def stopword_count(tokens: Column, stopwords: tuple[str, ...] = ENGLISH_STOPWORDS) -> Column:
    return _count_in_list(tokens, stopwords)


def punct_count(c: Column) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))


def digit_count(c: Column) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, r"[0-9]", ""))


def quality_metrics(c: Column) -> dict[str, Column]:
    """Quality-scoring feature set. Keys are output column names.

    ``quality_score`` is a deterministic [0,1] heuristic: rewards
    mid-length documents and plain words, penalizes punctuation/digit
    soup — the shape of heuristics used to filter web-scraped
    training corpora (length/punct/stopword ratios).
    """
    toks = tokens_col(c)
    n_tok = ws_token_count(c)
    n_chars = F.length(c)
    sw = stopword_count(toks)
    pc = punct_count(c)
    dc = digit_count(c)
    sw_ratio = F.round(F.try_divide(sw.cast("double"), n_tok.cast("double")), 6)
    punct_ratio = F.round(F.try_divide(pc.cast("double"), n_chars.cast("double")), 6)
    digit_ratio = F.round(F.try_divide(dc.cast("double"), n_chars.cast("double")), 6)
    avg_word_len = F.round(
        F.try_divide(
            F.length(F.regexp_replace(F.trim(c), r"\s+", "")).cast("double"),
            n_tok.cast("double"),
        ),
        6,
    )
    length_term = F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0))
    score = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.lit(0.5) * length_term
                + F.lit(0.5)
                - F.coalesce(punct_ratio, F.lit(0.0)) * F.lit(2.0)
                - F.coalesce(digit_ratio, F.lit(0.0)),
            ),
        ),
        6,
    )
    return {
        "n_tokens": n_tok,
        "avg_word_len": avg_word_len,
        "stopword_ratio": sw_ratio,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "quality_score": score,
    }


def repetition_metrics(c: Column) -> dict[str, Column]:
    """Gopher-style repetition signals (public heuristics from Rae et
    al. 2021's quality-filter appendix, used across web-corpus
    cleaning pipelines to drop boilerplate), computed COLUMNAR per
    row — bounded per-document work inside whole-stage codegen, no
    explode, no shuffle:

    - ``dup_line_frac``: fraction of newline-delimited lines that are
      exact duplicates of another line (0 for single-line docs)
    - ``top_bigram_frac``: fraction of all word 2-grams occupied by
      the most frequent one (NULL when the doc has < 2 words — no
      bigram exists to dominate)

    The dominant-bigram count comes from array_sort + ONE linear
    run-length fold (O(n log n) per row) — the naive
    distinct × scan form is O(d·n) and measurably explodes on
    long documents."""
    lines = F.split(c, "\n")
    n_lines = F.size(lines)
    dup_line_frac = F.round(
        F.try_divide(
            (n_lines - F.size(F.array_distinct(lines))).cast("double"),
            n_lines.cast("double"),
        ),
        6,
    )
    toks = tokens_col(c)
    n = F.size(toks)
    # bigrams via zip_with over two row-level slices — NEVER element_at
    # inside a per-element lambda: higher-order lambdas re-evaluate
    # outer expressions they close over PER ELEMENT, so indexing the
    # tokens array from inside transform() re-splits the text once per
    # bigram (O(n²) splitting; measured 10.7 s → 0.9 s on 5k docs)
    grams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )

    def _run_fold(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _run_fold,
    )["best"]
    # denominator is |grams| = n-1 by construction — computing it from
    # the token count keeps grams referenced exactly once in the plan
    top_bigram_frac = F.when(
        n >= 2,
        F.round(F.try_divide(top.cast("double"), (n - 1).cast("double")), 6),
    )
    return {
        "n_lines": n_lines,
        "dup_line_frac": dup_line_frac,
        "top_bigram_frac": top_bigram_frac,
    }


#: PII surface patterns — deliberately RE2-safe (character classes +
#: \b only, no lookaround) so the identical pattern runs in Spark's
#: Java regex AND DuckDB's RE2 oracle. These are detection HEURISTICS
#: for redaction/filter pipelines, not validators of the formats.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_metrics(c: Column) -> dict[str, Column]:
    """Per-document PII surface counts (one regexp_extract_all per
    pattern, whole-stage codegen) + an overall ``has_pii`` flag — the
    filter/redaction gate a training-data pipeline runs before a
    corpus ships. Counts, not booleans, so downstream can threshold
    ("one email in a mailto: is fine, forty is a dump")."""
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0)))
        for name, pat in PII_PATTERNS.items()
    }
    total = None
    for col in counts.values():
        total = col if total is None else total + col
    return {**counts, "has_pii": (total > 0)}


def lang_scores(c: Column) -> dict[str, Column]:
    """Marker-token hit count per candidate language."""
    toks = tokens_col(c)
    return {lang: _count_in_list(toks, LANG_MARKERS[lang]) for lang in LANG_ORDER}


def predicted_lang(c: Column) -> Column:
    """Argmax of marker scores with the fixed LANG_ORDER tie-break;
    'und' (undetermined) when no marker matched at all."""
    s = lang_scores(c)
    en, de, fr, es = (s[x] for x in LANG_ORDER)
    return (
        F.when(en + de + fr + es == 0, F.lit("und"))
        .when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def word_ngram_array(text: Column, n: int) -> Column:
    """DISTINCT word n-grams of ``text`` as an array<string> Column
    (whole trimmed text as one gram when shorter than ``n`` tokens;
    empty array for blank text).

    Built by zip_with-folding ``n`` shifted views of the token array —
    deliberately NOT transform-over-sequence with ``slice(toks, i, n)``
    in the lambda: an outer computed expression referenced inside a
    per-element lambda is re-evaluated PER ELEMENT (the C12 pitfall),
    so the regex tokenization ran O(tokens) times per row — measured
    ~10× slowdown on the gram queries at sf0.1. Here every reference
    to ``toks`` sits at the top level of one projection, where
    Spark's subexpression elimination evaluates the split once; the
    lambdas touch only their own lambda variables."""
    toks = tokens_col(text)
    if n <= 1:
        grams = toks
    else:
        acc = toks
        for k in range(1, n):
            rest = F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(1)))
            acc = F.zip_with(acc, rest, lambda a, b: F.concat(a, F.lit(" "), b))
        grams = F.slice(acc, 1, F.greatest(F.size(toks) - (n - 1), F.lit(1)))
        grams = F.when(
            F.size(toks) < F.lit(n), F.array(F.concat_ws(" ", toks))
        ).otherwise(grams)
    return F.filter(
        F.array_distinct(grams), lambda g: g.isNotNull() & (g != F.lit(""))
    )


def char_shingles(c: Column, k: int = 8) -> Column:
    """All k-char shingles of ``c`` → array<string> (whole string when
    shorter than k). Expressed as transform-over-sequence so it stays
    JVM-side; at 100 TB this is the map side of a dedup shuffle."""
    n = F.greatest(F.length(c) - F.lit(k - 1), F.lit(1))
    return F.transform(F.sequence(F.lit(1), n), lambda i: F.substring(c, i, k))


def fingerprint_col(c: Column, k: int = 8) -> Column:
    """Deterministic document fingerprint: min-md5 over k-char shingles
    (winnowing-style min-hash fingerprint; portable to ANSI SQL, unlike
    a stateful rolling hash, and equally shift-sensitive)."""
    return F.array_min(F.transform(char_shingles(c, k), lambda s: F.md5(s)))


def rolling_hash_col(c: Column, k: int = 8, base: int = 257, mod: int = 1_000_000_007) -> Column:
    """Classic polynomial rolling-hash fingerprint: min over windows of
    hash(s[i:i+k]) with hash = Σ ord(ch)·base^j mod p. Pure column
    aggregation over the shingle array (aggregate-fold, JVM-side)."""
    def poly(s: Column) -> Column:
        chars = F.split(s, "")
        return F.aggregate(
            F.filter(chars, lambda ch: ch != ""),
            F.lit(0).cast("long"),
            lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
        )

    return F.array_min(F.transform(char_shingles(c, k), poly))
