"""Code-corpus quality filters (StarCoder/SantaCoder-style rules).

Not in the reference (no text layer); the heuristics are the published
BigCode preprocessing rules (Li et al., "StarCoder: may the source be
with you!", 2023; Allal et al., SantaCoder 2023): drop files that are
effectively data or minified/generated blobs —

  max line length > 1000, mean line length > 100,
  alphanumeric fraction < 0.25, or an auto-generation marker.

All metrics are line/character statistics, so the operator applies to
any (id, text) table; the code-corpus interpretation (comment ratio
by #/// prefix) is mechanical per line.

Plan shape: one `split(text, '\\n')` plus higher-order array folds
(filter/transform/aggregate) — a single whole-stage-codegen
projection per document, no explode, no shuffle, no UDF. A 100 TB
corpus streams through scan -> project -> sink; the only aggregate a
user adds downstream (keep-rate per lang, etc.) is map-side
combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alnum_count(col: Column) -> Column:
    return F.length(F.regexp_replace(col, r"[^0-9A-Za-z]", ""))


def code_quality_features(
    df: DataFrame,
    col: str = "text",
    max_line: int = 1000,
    max_avg_line: int = 100,
    min_alnum_fraction: float = 0.25,
) -> DataFrame:
    """Append per-document code-quality metrics and a keep verdict.

    Adds: n_lines, n_blank, n_comment (#/// prefixed), max_line_len,
    avg_line_len, alnum_fraction, autogen (marker present), keep.
    Empty documents get zero metrics and keep = false.
    """
    lines = F.split(F.col(col), "\n")
    trimmed = F.transform(lines, F.trim)
    n_lines = F.size(lines)
    n_blank = F.size(F.filter(trimmed, lambda l: F.length(l) == 0))
    n_comment = F.size(
        F.filter(
            trimmed,
            lambda l: l.startswith("#") | l.startswith("//"),
        )
    )
    line_lens = F.transform(lines, F.length)
    max_len = F.coalesce(F.array_max(line_lens), F.lit(0))
    total_chars = F.aggregate(
        line_lens, F.lit(0), lambda acc, x: acc + x
    )
    avg_len = F.when(
        n_lines > 0, total_chars.cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    alnum_frac = F.when(
        F.length(F.col(col)) > 0,
        _alnum_count(F.col(col)).cast("double") / F.length(F.col(col)),
    ).otherwise(F.lit(0.0))
    autogen = F.lower(F.col(col)).rlike("auto-generated|do not edit")
    keep = (
        (F.length(F.col(col)) > 0)
        & (max_len <= max_line)
        & (avg_len <= max_avg_line)
        & (alnum_frac >= min_alnum_fraction)
        & ~autogen
    )
    return (
        df.withColumn("n_lines", n_lines.cast("long"))
        .withColumn("n_blank", n_blank.cast("long"))
        .withColumn("n_comment", n_comment.cast("long"))
        .withColumn("max_line_len", max_len.cast("long"))
        .withColumn("avg_line_len", avg_len)
        .withColumn("alnum_fraction", alnum_frac)
        .withColumn("autogen", autogen)
        .withColumn("keep", keep)
    )
