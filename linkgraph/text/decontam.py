"""Benchmark decontamination: flag training documents sharing word
n-grams with an evaluation set.

The standard pre-training hygiene step (n-gram overlap
decontamination, as popularized by the GPT-3 appendix): a training
document is contaminated if any of its word n-grams appears in any
benchmark document. n-grams are EXACT lowercase word strings — no
hashing — so the result is engine-independent and the driver oracle
reproduces it verbatim.

Plan shape:
  shingle both sides (lower split -> transform over an index sequence)
  benchmark n-grams -> distinct                      (small: eval sets)
  docs shingles  ⋈ benchmark shingles   broadcast INNER join + groupBy
  left join doc ids back                -> n_contaminated (0 for clean)

Scale notes: the benchmark side is an evaluation suite — thousands of
documents, millions of n-grams at most — so it broadcasts; the corpus
side streams through as an explode + broadcast-hash-join probe with NO
shuffle of corpus data (the per-doc count aggregate re-shuffles only
the matching shingles, a vanishing fraction). Short documents
(< n words) contribute no n-grams and are trivially clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shingles(col: str, n: int) -> Column:
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    idx = F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    col: str = "text",
) -> DataFrame:
    """Per training document: how many of its word n-grams occur in the
    benchmark set. Returns (id, n_contaminated, contaminated) for EVERY
    input document (clean docs carry 0 / false)."""
    bench_grams = (
        benchmark.select(F.explode(_shingles(col, n)).alias("gram")).distinct()
    )
    doc_grams = docs.select(
        F.col(id_col), F.explode(_shingles(col, n)).alias("gram")
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left_outer")
        .select(
            id_col,
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )
