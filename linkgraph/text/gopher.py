"""Gopher-style document quality rules (Rae et al., "Scaling Language
Models: Methods, Analysis & Insights from Training Gopher",
arXiv:2112.11446, Appendix A1.1 — the MassiveWeb repetition-free
heuristics; same family as Penedo et al.'s RefinedWeb reimplementation).

Not in the reference (no text layer). Complements c4.py (line-shape
rules) and repetition.py (duplicate n-gram mass): Gopher's rules are
whole-document shape statistics —

  word count in [min_words, max_words]
  mean word length in [min_mean_word_len, max_mean_word_len]
  hash-to-word ratio ('#') <= max_symbol_ratio
  ellipsis-to-word ratio ('...') <= max_symbol_ratio
  fraction of lines starting with a bullet <= max_bullet_ratio
  fraction of lines ending with an ellipsis <= max_ellipsis_ratio
  fraction of words with >= 1 alphabetic char >= min_alpha_word_ratio
  >= min_stop_hits distinct hits from a tiny English stopword list

Everything is Catalyst array/string algebra inside whole-stage codegen
(split + higher-order folds; no UDFs, no explode, no shuffle): one pure
per-row projection that fuses into the parquet scan at 100 TB, exactly
like c4_filters / code_quality_features, and composes with them into a
single pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The paper's "must contain two of" stop list (A1.1).
STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLETS = ("- ", "* ", "•")


def _count_where(arr: Column, pred) -> Column:
    return F.size(F.filter(arr, pred)).cast("long")


def gopher_filters(
    df: DataFrame,
    col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Append Gopher quality statistics and the document verdict.

    New columns:
      g_n_words          — whitespace words
      g_mean_word_len    — mean word length (0.0 for empty docs)
      g_hash_ratio       — '#' occurrences per word
      g_ellipsis_sym_ratio — '...' / '…' occurrences per word
                           (each compared to max_symbol_ratio
                           SEPARATELY, per the paper's A1.1 wording;
                           pooling them was stricter than Gopher)
      g_bullet_ratio     — fraction of non-blank lines starting - / * / •
      g_ellipsis_ratio   — fraction of non-blank lines ending '...' / '…'
      g_alpha_word_ratio — fraction of words containing a letter
      g_stop_hits        — distinct stopword-list words present
      keep_gopher        — all rules pass

    Ratios are rounded to 6 decimals (the engine-wide hash-canon
    convention) so the column is directly oracle-comparable.
    """
    t = F.trim(F.col(col))
    words = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n_words = F.size(words).cast("long")
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            words, F.lit(0
            ).cast("long"), lambda acc, w: acc + F.length(w)
        ) / n_words
    )
    n_hash = F.size(F.regexp_extract_all(F.col(col), F.lit("#"), F.lit(0)))
    n_ell = F.size(
        F.regexp_extract_all(F.col(col), F.lit(r"\.\.\.|…"), F.lit(0))
    )
    hash_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_hash / n_words.cast("double")
    )
    ell_sym_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_ell / n_words.cast("double")
    )

    lines = F.filter(F.split(F.col(col), r"\n"), lambda l: F.length(F.trim(l)) > 0)
    n_lines = F.size(lines).cast("long")

    def _starts_bullet(l: Column) -> Column:
        lt = F.trim(l)
        c = F.lit(False)
        for b in _BULLETS:
            c = c | lt.startswith(b)
        return c

    def _ends_ellipsis(l: Column) -> Column:
        lt = F.trim(l)
        return lt.endswith("...") | lt.endswith("…")

    bullet_ratio = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        _count_where(lines, _starts_bullet) / n_lines.cast("double")
    )
    ellipsis_ratio = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        _count_where(lines, _ends_ellipsis) / n_lines.cast("double")
    )

    alpha_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(
        _count_where(words, lambda w: w.rlike("[A-Za-z]"))
        / n_words.cast("double")
    )
    low_words = F.transform(words, F.lower)
    stop_hits = F.aggregate(
        F.array(*[F.array_contains(low_words, s).cast("int") for s in STOPWORDS]),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")

    out = (
        df.withColumn("g_n_words", n_words)
        .withColumn("g_mean_word_len", F.round(mean_wl, 6))
        .withColumn("g_hash_ratio", F.round(hash_ratio, 6))
        .withColumn("g_ellipsis_sym_ratio", F.round(ell_sym_ratio, 6))
        .withColumn("g_bullet_ratio", F.round(bullet_ratio, 6))
        .withColumn("g_ellipsis_ratio", F.round(ellipsis_ratio, 6))
        .withColumn("g_alpha_word_ratio", F.round(alpha_ratio, 6))
        .withColumn("g_stop_hits", stop_hits)
    )
    return out.withColumn(
        "keep_gopher",
        F.col("g_n_words").between(min_words, max_words)
        & F.col("g_mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("g_hash_ratio") <= max_symbol_ratio)
        & (F.col("g_ellipsis_sym_ratio") <= max_symbol_ratio)
        & (F.col("g_bullet_ratio") <= max_bullet_ratio)
        & (F.col("g_ellipsis_ratio") <= max_ellipsis_ratio)
        & (F.col("g_alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("g_stop_hits") >= min_stop_hits),
    )


def apply_gopher(df: DataFrame, col: str = "text", **kwargs) -> DataFrame:
    """The filtering form: surviving documents, statistics dropped."""
    feats = gopher_filters(df, col=col, **kwargs)
    return feats.where(F.col("keep_gopher")).drop(
        "g_n_words", "g_mean_word_len", "g_hash_ratio",
        "g_ellipsis_sym_ratio", "g_bullet_ratio",
        "g_ellipsis_ratio", "g_alpha_word_ratio", "g_stop_hits", "keep_gopher",
    )
