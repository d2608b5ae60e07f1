"""Corpus-level token statistics: term frequencies and a Zipf fit.

Not in the reference (no text layer); these are the first-look
diagnostics of any training corpus — vocabulary size, token mass, the
head of the frequency table, and the Zipf exponent (the log-log slope
of frequency vs rank; natural-language corpora sit near -1, and large
deviations flag boilerplate floods or tokenizer damage).

Plan shape: one explode -> term hash aggregate (map-side combinable;
the only O(corpus) shuffle), then top-N via orderBy(...).limit(N) —
Spark plans that as TakeOrderedAndProject, a per-partition heap + one
N-row driver merge, NOT a full vocabulary sort — and the rank window
runs over those N rows only (single tiny partition by construction).
The Zipf fit is covar_pop/var_pop over ln(rank)/ln(freq) of the top N.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_frequencies(
    df: DataFrame, col: str = "text", top_n: int = 20
) -> DataFrame:
    """Top-N corpus terms as (rank, term, freq), ties broken by term."""
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    corpus = (
        df.where(F.length(F.trim(F.col(col))) > 0)
        .select(F.explode(words).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = corpus.orderBy(F.desc("freq"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "term", "freq"
    )


def corpus_stats(
    df: DataFrame, col: str = "text", zipf_top: int = 100
) -> DataFrame:
    """One row: (n_tokens, vocab_size, zipf_slope).

    zipf_slope = population least-squares slope of ln(freq) on ln(rank)
    over the `zipf_top` most frequent terms.
    """
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    corpus = (
        df.where(F.length(F.trim(F.col(col))) > 0)
        .select(F.explode(words).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    totals = corpus.agg(
        F.sum("freq").alias("n_tokens"), F.count(F.lit(1)).alias("vocab_size")
    )
    top = corpus.orderBy(F.desc("freq"), F.asc("term")).limit(zipf_top)
    w = Window.orderBy(F.desc("freq"), F.asc("term"))
    ranked = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    slope = ranked.agg(
        (F.covar_pop("x", "y") / F.var_pop("x")).alias("zipf_slope")
    )
    return totals.join(F.broadcast(slope)).select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "vocab_size",
        "zipf_slope",
    )


def length_percentiles(
    df: DataFrame,
    col: str = "n_chars",
    by: str = "lang",
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Per-group exact length percentiles (type-7 linear interpolation,
    the definition Spark's `percentile` and DuckDB's `quantile_cont`
    share) plus count/mean — the length-distribution audit every
    corpus cut starts from.

    Exact percentiles sort WITHIN each group's aggregation buffer; at
    100 TB the same call swaps to `approx_percentile` (t-digest,
    mergeable sketch, no global sort) — the output contract is
    identical, which is why the column names don't bake in exactness.
    """
    qcol = F.lit(list(quantiles)).cast("array<double>")
    out = df.groupBy(by).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(col), 6).alias("mean_len"),
        F.percentile(col, qcol).alias("_q"),
    )
    return out.select(
        by,
        "n_docs",
        "mean_len",
        *[
            F.round(F.col("_q")[i], 6).alias(f"p{int(q * 100)}")
            for i, q in enumerate(quantiles)
        ],
    )
