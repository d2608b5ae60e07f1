"""Duplicate n-gram span detection — the exact-substring-dedup
building block.

Not in the reference (no text layer); semantics follow the exact
substring deduplication of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL 2022): a word n-gram that occurs
more than once ANYWHERE in the corpus (another document or the same
one) marks every position where it occurs as duplicated; runs of
overlapping duplicated n-grams merge into maximal spans. (Lee et al.
operate on a suffix array of the byte stream; over word n-grams at
fixed n this inverted-index formulation finds exactly the spans of
length >= n, which is the dedup policy's trigger condition.)

Output per document: maximal duplicated token spans
(doc_id, span_start, span_len) in 0-based token offsets, plus a
per-document roll-up (dup_token_fraction) for filter thresholds.

Plan shape:
  shingle (lower split -> transform over an index sequence, the
  decontam.py construction) -> posexplode      (pos, gram) per doc
  gram occurrence count     -> ONE hash aggregate over gram keys
  duplicated positions      -> semi-join shingles against grams
                               with count >= 2
  span merge                -> per-doc window: island detection
                               (pos - row_number = island key), one
                               aggregate per island

Scale notes: the gram aggregate is the only corpus-sized shuffle and
is map-side combinable; the window partitions by doc_id (bounded by
document length, never global). Gram keys here are the exact strings
so the DuckDB oracle replays verbatim; at petabyte scale you'd swap
the key for xxhash64(gram) (built-in, 8 bytes) — the plan shape is
unchanged, collisions only ever over-mark (a span false-positive at
~2^-64 per pair), and the swap is a one-line projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _shingles(col: str, n: int) -> Column:
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    idx = F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def duplicate_spans(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Maximal duplicated n-gram spans per document.

    Returns (doc_id, span_start, span_len): 0-based token offset and
    length IN TOKENS (>= n by construction) of each maximal run of
    positions whose n-gram occurs >= 2 times corpus-wide. Documents
    with no duplicated n-grams contribute no rows.
    """
    shingled = docs.select(
        F.col(id_col),
        F.posexplode(_shingles(col, n)).alias("pos", "gram"),
    )
    dup_grams = (
        shingled.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .where(F.col("_occ") >= 2)
        .select("gram")
    )
    dup_pos = shingled.join(dup_grams, "gram", "left_semi")
    # Island detection: consecutive duplicated positions share
    # (pos - row_number); each island [first, last] covers tokens
    # [first, last + n - 1].
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = dup_pos.withColumn(
        "_isl", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "_isl")
        .agg(F.min("pos").alias("span_start"), F.max("pos").alias("_last"))
        .select(
            F.col(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            (F.col("_last") - F.col("span_start") + n)
            .cast("long")
            .alias("span_len"),
        )
    )


def duplicate_fraction(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Per-document duplicated-token fraction (0 for clean docs).

    Returns (doc_id, n_tokens, dup_tokens, dup_fraction) for EVERY
    input document — the filter-threshold surface (drop documents
    whose duplicated mass exceeds a policy cutoff).
    """
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    n_tokens = docs.select(
        F.col(id_col),
        F.when(F.length(F.trim(F.col(col))) > 0, F.size(words))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )
    spans = duplicate_spans(docs, n=n, id_col=id_col, col=col)
    per_doc = spans.groupBy(id_col).agg(
        F.sum("span_len").alias("dup_tokens")
    )
    return (
        n_tokens.join(per_doc, id_col, "left_outer")
        .withColumn("dup_tokens", F.coalesce("dup_tokens", F.lit(0)))
        .select(
            id_col,
            "n_tokens",
            "dup_tokens",
            F.when(
                F.col("n_tokens") > 0,
                F.col("dup_tokens") / F.col("n_tokens"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
