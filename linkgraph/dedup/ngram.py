"""Exact n-gram Jaccard similarity pairs via an inverted index.

Unlike MinHash (probabilistic recall), this computes the exact Jaccard
for every pair sharing at least one n-gram, using the classic
inverted-index + count trick: |A ∩ B| falls out of a groupBy over
exploded (shingle -> doc) postings, and |A ∪ B| = |A| + |B| − |A ∩ B|,
so the verify step needs no access to the original sets.

Scale controls:
- postings for a shingle appearing in more than `max_doc_freq` docs are
  dropped (stopword-gram suppression — the standard trick; a shingle in
  f docs generates O(f²) pairs). Explicit, logged knob.
- the pair aggregation shuffles on (id_a, id_b) — near-uniform keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.dedup.minhash import shingle_sets

_PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x as id_a, y as id_b))))"
)


def ngram_jaccard_pairs(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    shingle: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 512,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with exact Jaccard >= t."""
    sets = shingle_sets(df, col, id_col, shingle)
    # Materialize the inverted index once: it feeds both the bucket
    # grouping and the per-doc set sizes (shingles are distinct per doc,
    # so |A| = its posting count) — without the cut the shingling
    # expression tree runs once per consumer. At cluster scale the
    # posting list is the stage checkpoint of this pipeline.
    postings = sets.select("id", F.explode("shingles").alias("g")).localCheckpoint(
        eager=True
    )
    sizes = postings.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    grouped = (
        postings.groupBy("g")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .where((F.size("ids") > 1) & (F.size("ids") <= max_doc_freq))
    )
    co = (
        grouped.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .groupBy("p.id_a", "p.id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    a = sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a")
    b = sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b")
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        co.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", jac.cast("double").alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )
