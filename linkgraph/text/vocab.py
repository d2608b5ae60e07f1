"""Vocabulary construction + OOV accounting — the tokenizer-prep step
of a training-data pipeline.

Not in the reference (no text layer). ``build_vocab`` assigns dense
integer ids to the ``max_size`` most frequent terms above a count
floor, deterministically (ties broken by term, so the id table is
identical across runs and partitionings — the stable-ids discipline of
ingest/derive.py applied to tokens). ``oov_stats`` scores a slice
against a vocabulary: per-document in/out-of-vocabulary token counts —
the coverage check run before committing to a tokenizer.

Plan shape: the corpus-sized work is ONE map-side-combinable term
count; the rank window then runs over the FILTERED vocabulary
candidates only (≤ max(vocab·K, terms above min_count) rows — at
100 TB the min_count floor is what keeps the window input bounded:
hapax mass never reaches the sort). ``oov_stats`` is one explode +
one broadcast-joined membership probe + one re-aggregate keyed by the
document — no shuffle of the corpus beyond the token aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _terms(df: DataFrame, col: str) -> DataFrame:
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    return df.where(F.length(F.trim(F.col(col))) > 0).select(
        F.explode(words).alias("term")
    )


def build_vocab(
    df: DataFrame,
    col: str = "text",
    max_size: int = 10_000,
    min_count: int = 2,
) -> DataFrame:
    """(token_id, term, freq) — token_id dense, 0-based, by
    (freq desc, term asc)."""
    counts = (
        _terms(df, col)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= min_count)
    )
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    return (
        counts.orderBy(F.desc("freq"), F.asc("term"))
        .limit(max_size)
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("token_id"),
            "term",
            "freq",
        )
    )


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (n_tokens, n_oov, oov_rate) against a vocabulary.

    The vocab side is broadcast (it is bounded by construction); the
    membership probe is a broadcast left-semi-shaped outer join on the
    exploded tokens, re-aggregated by document — one corpus pass.
    """
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    toks = df.where(F.length(F.trim(F.col(col))) > 0).select(
        id_col, F.explode(words).alias("term")
    )
    v = F.broadcast(vocab.select("term", F.lit(1).alias("_in")))
    tagged = toks.join(v, "term", "left_outer")
    out = tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).alias("n_oov"),
    )
    return out.select(
        id_col,
        "n_tokens",
        "n_oov",
        F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
    )
