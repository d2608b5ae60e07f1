"""C4-style heuristic cleaning filters (Raffel et al., "Exploring the
limits of transfer learning with a unified text-to-text transformer",
JMLR 2020, §2.2 — the rules that built C4 from Common Crawl).

Not in the reference (no text layer); these are the standard first-pass
structural filters a training-data pipeline runs before any model-based
scoring:

  line level: keep only lines that end in terminal punctuation AND
              have at least `min_words_per_line` words;
  doc level:  flag documents containing a curly brace (code/markup),
              the phrase "lorem ipsum" (placeholder boilerplate), or
              fewer than `min_sentences` sentences after line cleaning.

Everything is Catalyst array/string algebra inside whole-stage codegen
(split -> filter -> array_join; no UDFs, no shuffle): the filter is a
pure per-row map, so at 100 TB it fuses into the scan projection and
costs one pass. Only appends columns, composing with analysis.py /
repetition.py into a single projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERMINAL = (".", "!", "?", '"')


def _line_ok(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    ends_ok = F.substring(t, -1, 1).isin(*_TERMINAL)
    n_words = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    return ends_ok & (n_words >= min_words)


def c4_filters(
    df: DataFrame,
    col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Append C4 line-cleaning output and document-level keep signals.

    New columns:
      text_clean    — surviving lines re-joined with newlines
      n_lines       — non-blank input lines
      n_kept_lines  — lines passing the terminal-punct + min-words rule
      n_sentences   — terminal punctuation marks in the cleaned text
      has_brace     — document contains '{' or '}'
      has_lorem     — document contains 'lorem ipsum' (case-insensitive)
      keep_doc      — the C4 document verdict
    """
    lines = F.filter(
        F.split(F.col(col), r"\n"), lambda l: F.length(F.trim(l)) > 0
    )
    kept = F.filter(lines, lambda l: _line_ok(l, min_words_per_line))
    clean = F.array_join(F.transform(kept, F.trim), "\n")
    n_sentences = F.size(
        F.regexp_extract_all(clean, F.lit(r"[.!?]"), F.lit(0))
    )
    has_brace = F.col(col).contains("{") | F.col(col).contains("}")
    has_lorem = F.lower(F.col(col)).contains("lorem ipsum")
    out = (
        df.withColumn("text_clean", clean)
        .withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn("n_sentences", n_sentences.cast("long"))
        .withColumn("has_brace", has_brace)
        .withColumn("has_lorem", has_lorem)
    )
    return out.withColumn(
        "keep_doc",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_brace")
        & ~F.col("has_lorem"),
    )


def apply_c4(df: DataFrame, col: str = "text", **kwargs) -> DataFrame:
    """The filtering form: cleaned text for surviving documents only."""
    feats = c4_filters(df, col=col, **kwargs)
    return feats.where(F.col("keep_doc")).drop(
        "n_lines", "n_kept_lines", "n_sentences", "has_brace",
        "has_lorem", "keep_doc",
    )
