"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

Everything here is **pure JVM-side Catalyst expressions** (no Python in
the hot path at all — not even pandas UDFs): at 100 TB these run inside
whole-stage codegen with full column pruning, so a scan that only needs
`token_stats` reads exactly one string column. Each function takes and
returns a DataFrame and only appends columns, so they compose into one
projection (one pass over the data) when chained.

These extend the reference's scope per the build brief (the reference
has no text layer; its only scalar functions are split/toInt parsing,
graph-mining-spark Truss.scala:24-26).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/symbol segmentation (GPT-2-style coarse classes).
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "un", "una", "por"],
}


def _words(col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(col))), r"\s+")


def token_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Append n_tokens_ws (whitespace) and n_tokens_bpe (regex classes)."""
    ws = F.when(F.length(F.trim(F.col(col))) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(col)), r"\s+"))
    )
    # lit() pattern, not F.expr: a SQL string literal would eat the \s.
    bpe = F.size(F.regexp_extract_all(F.col(col), F.lit(_TOKEN_RE), F.lit(0)))
    return df.withColumn("n_tokens_ws", ws.cast("long")).withColumn(
        "n_tokens_bpe", bpe.cast("long")
    )


def quality_features(df: DataFrame, col: str = "text") -> DataFrame:
    """Append length/punctuation/alpha/stopword quality signals + a
    composite quality_score in [0, 1]."""
    length = F.length(F.col(col))
    n_alpha = F.length(F.regexp_replace(F.col(col), r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(F.col(col), r"[^\.,;:!?'\"()]", ""))
    words = _words(col)
    n_words = F.when(length == 0, F.lit(0)).otherwise(F.size(words))
    en_stop = F.array([F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(words, en_stop))
    alpha_ratio = F.when(length > 0, n_alpha / length).otherwise(F.lit(0.0))
    punct_ratio = F.when(length > 0, n_punct / length).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_words > 0, n_stop / n_words).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_words > 0, n_alpha / n_words).otherwise(F.lit(0.0))
    # Gopher-ish composite: alpha-heavy, some stopwords, sane word length.
    score = (
        F.least(alpha_ratio * 1.25, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.when((mean_word_len >= 2) & (mean_word_len <= 12), 1.0).otherwise(0.0) * 0.2
        + F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0) * 0.1
    )
    return (
        df.withColumn("n_chars_q", length.cast("long"))
        .withColumn("alpha_ratio", alpha_ratio.cast("double"))
        .withColumn("punct_ratio", punct_ratio.cast("double"))
        .withColumn("stopword_ratio", stop_ratio.cast("double"))
        .withColumn("mean_word_len", mean_word_len.cast("double"))
        .withColumn("quality_score", score.cast("double"))
    )


def language_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Append lang_pred: argmax over per-language stopword hit counts
    (n-gram-free heuristic; 'und' = undetermined when nothing matches).

    The per-language score is one array_intersect against a constant
    array — O(words · langs) comparisons inside codegen, no shuffle.
    """
    words = _words(col)
    scores = [
        F.size(F.array_intersect(words, F.array([F.lit(w) for w in sw]))).alias(lg)
        for lg, sw in _STOPWORDS.items()
    ]
    tagged = df.withColumn(
        "_lang_scores",
        F.array(
            *[
                F.struct(s.alias("score"), F.lit(lg).alias("lang"))
                for lg, s in zip(_STOPWORDS, scores)
            ]
        ),
    )
    best = F.array_max("_lang_scores")
    pred = F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    return tagged.withColumn("lang_pred", pred).drop("_lang_scores")


def doc_fingerprint(
    df: DataFrame, col: str = "text", shingle: int = 5, keep: int = 8
) -> DataFrame:
    """Append a MinHash-style document sketch:

    - ``fingerprint_sketch``: the `keep` smallest xxhash64 values over
      the word-`shingle`-grams. A local edit touching w shingles
      perturbs at most ~w of the `keep` entries, so *sketch overlap*
      (array_intersect size) is the edit-robust similarity signal —
      the exact-equality use case is covered by ``fingerprint``.
    - ``fingerprint``: xxhash64 of the sketch — equal only for
      (near-)identical shingle sets; the cheap exact-dup grouping key.

    Entirely Catalyst: split -> shingle via transform over an index
    sequence -> xxhash64 per shingle -> array_sort -> slice -> hash.
    Short docs (< shingle words) fall back to a whole-text hash.
    """
    words = F.split(F.trim(F.col(col)), r"\s+")
    n = F.size(words)
    idx = F.sequence(F.lit(1), n - F.lit(shingle - 1))
    grams = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(words, i, shingle)))
    )
    mins = F.when(n >= shingle, F.slice(F.array_sort(grams), 1, keep)).otherwise(
        F.array(F.xxhash64(F.trim(F.col(col))))
    )
    return df.withColumn("fingerprint_sketch", mins).withColumn(
        "fingerprint", F.xxhash64(F.col("fingerprint_sketch"))
    )


def sketch_overlap(a: Column, b: Column) -> Column:
    """Similarity in [0,1] between two fingerprint sketches."""
    return F.size(F.array_intersect(a, b)) / F.greatest(
        F.size(a), F.size(b)
    )
