"""Corpus-trained unigram language-model scoring (CCNet-style quality
proxy).

Not in the reference (no text layer there); this is the classic
lightweight stand-in for perplexity filtering (Wenzek et al., "CCNet:
Extracting high quality monolingual datasets from web crawl data",
LREC 2020 — there a KenLM 5-gram; here the unigram member of the same
family, which needs no external model artifact): documents whose token
distribution diverges from the corpus distribution (gibberish, boiler-
plate, wrong language) score low and land in the tail bucket.

Model: add-one-smoothed unigram over the corpus itself,
    p(w) = (count(w) + 1) / (T + V)
with T total tokens and V vocabulary size; per-document score is the
token-weighted mean log-probability and its exp-negative, perplexity.

Plan shape, all JVM-side: one explode -> (doc, term, tf) aggregate
(map-side combinable), one global (T, V) aggregate broadcast as a
single row, one term-keyed join of per-doc tfs against the corpus
counts, one per-doc weighted aggregate. The term join is the only
O(corpus) shuffle and is co-partitioned on the term key.

Scale notes: the vocabulary table is NOT broadcast (web-scale vocab is
easily 1e9 rows with hapax legomena); both sides of the term join
shuffle on term, where term frequency skew ("the") is bounded by the
per-doc pre-aggregation — each document contributes at most ONE row
per distinct term, so the hottest key carries n_docs rows, not
n_tokens. At 100 TB you would additionally prune hapaxes (count = 1)
into a default-probability bucket; kept exact here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm_scores(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram log-likelihood under the corpus model.

    Returns (id_col, n_tokens, avg_logprob, perplexity); documents with
    no tokens are omitted (they have no likelihood).
    """
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    toks = (
        df.where(F.length(F.trim(F.col(col))) > 0)
        .select(F.col(id_col), F.explode(words).alias("term"))
    )
    doc_tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    corpus = doc_tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    totals = corpus.agg(
        F.sum("cnt").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )
    logp = F.log(
        (F.col("cnt") + 1.0) / (F.col("t_total") + F.col("v_size"))
    )
    return (
        doc_tf.join(corpus, "term")
        .join(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(F.col("tf") * logp) / F.sum("tf")).alias("avg_logprob"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logprob")))
    )
