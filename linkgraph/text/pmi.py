"""Pointwise mutual information over document-level co-occurrence —
the classic phrase/association miner (Church & Hanks, "Word association
norms, mutual information, and lexicography", CL 1990).

Not in the reference (no text layer). For terms a, b with document
frequencies c(a), c(b), co-document count c(a,b), and N scored docs:

    pmi  = ln( c(a,b) * N / (c(a) * c(b)) )
    npmi = pmi / -ln( c(a,b) / N )        (normalized to [-1, 1])

Plan shape: one explode -> DISTINCT (doc, term) projection, one
self-join per doc (term_a < term_b), one pair count aggregate
(map-side combinable), two broadcast-free df joins keyed on term, one
1-row N broadcast.

Scale notes: the per-doc pair expansion is quadratic in DISTINCT terms
per doc — the standard mitigations are both available as pushed-down
filters BEFORE the self-join: `max_doc_terms` drops pathological docs
(a 100k-term doc contributes 5e9 pairs and no lexical signal), and
`max_df_frac` drops corpus-stopwords (present in most docs, PMI ~ 0 by
construction). `min_pairs` prunes the hapax pair tail inside the
aggregate (HAVING) before the df joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pmi_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_pairs: int = 2,
    max_doc_terms: int | None = None,
    max_df_frac: float | None = None,
) -> DataFrame:
    """(term_a, term_b, n_pairs, pmi, npmi) for co-occurring term pairs."""
    words = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    dw = (
        df.where(F.length(F.trim(F.col(col))) > 0)
        .select(F.col(id_col).alias("doc"), F.explode(words).alias("term"))
        .distinct()
    )
    if max_doc_terms is not None:
        sizes = dw.groupBy("doc").agg(F.count(F.lit(1)).alias("nt"))
        dw = dw.join(
            sizes.where(F.col("nt") <= max_doc_terms).select("doc"), "doc",
            "left_semi",
        )
    n_docs = dw.select("doc").distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    cw = dw.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df_frac is not None:
        cw = cw.join(F.broadcast(n_docs)).where(
            F.col("df") <= F.col("n_docs") * max_df_frac
        ).select("term", "df")
        dw = dw.join(cw.select("term"), "term", "left_semi")

    a, b = dw.alias("a"), dw.alias("b")
    pairs = (
        a.join(b, "doc")
        .where(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .where(F.col("n_pairs") >= min_pairs)
    )
    ca = cw.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    cb = cw.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    joint = pairs.join(ca, "term_a").join(cb, "term_b").join(F.broadcast(n_docs))
    pmi = F.log(
        F.col("n_pairs") * F.col("n_docs") / (F.col("df_a") * F.col("df_b"))
    )
    npmi = pmi / -F.log(F.col("n_pairs") / F.col("n_docs"))
    return joint.select(
        "term_a",
        "term_b",
        "n_pairs",
        pmi.alias("pmi"),
        F.when(F.col("n_pairs") == F.col("n_docs"), F.lit(1.0))
        .otherwise(npmi)
        .alias("npmi"),
    )
