"""TF-IDF keyword extraction for training-data pipelines.

Extends the reference's scope (it has no text layer) with the standard
salient-terms building block: per document, the top-k terms by
``tf * idf`` where ``tf`` is the in-document term count and
``idf = ln((N + 1) / (df + 1)) + 1`` (the smoothed formulation, so
a term present in every document still gets positive weight and a
df=0 term can never divide by zero).

Plan shape (all JVM-side):
  tokenize (lower + regexp_extract_all)  -> explode              O(tokens)
  tf   = groupBy(doc, term).count()                              1 shuffle
  df   = tf.groupBy(term).count()          (docs per term)       1 shuffle
  join tf ⋈ idf on term                    (broadcast: |vocab| << |corpus|)
  top-k per doc: row_number over (score DESC, term ASC)          1 shuffle

Scale notes: the vocabulary after min_df pruning is orders of
magnitude smaller than the corpus, so the idf join is an explicit
broadcast. The window partitions by doc_id — per-partition state is
one document's distinct terms, bounded by document length, so no skew
beyond document-length skew (which AQE splits). min_df prunes the
hapax tail BEFORE the join, shrinking the broadcast build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WORD_RE = "[a-z]+"


def tfidf_top_terms(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k salient terms per document: (id, term, tf, score, rank).

    Deterministic: ties break on the lexicographically smaller term.
    """
    terms = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(col)), F.lit(_WORD_RE), F.lit(0))
        ).alias("term"),
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
        .select(
            "term",
            (
                F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
            ).alias("idf"),
        )
    )
    scored = tf.join(F.broadcast(idf), "term").select(
        id_col, "term", "tf", (F.col("tf") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "score")
    )
