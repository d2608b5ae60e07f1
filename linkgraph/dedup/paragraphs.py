"""Corpus-global paragraph-level exact deduplication.

Not in the reference (no text layer); this is the C4 / RefinedWeb
"remove repeated spans across pages" step at paragraph granularity:
every paragraph that appears more than once in the corpus survives
ONLY at its first occurrence (smallest (doc, position)), and each
document's text is rebuilt from its surviving paragraphs in order.

Plan shape: posexplode -> one hash aggregate per distinct paragraph
computing the min (doc, pos) survivor as a struct-min (map-side
combinable — duplicate-heavy corpora collapse before the shuffle,
exactly like exact.py's doc-level dedup), one co-keyed semi-join of
the exploded paragraphs against the survivors, one per-doc rebuild
aggregate (collect surviving (pos, para), array_sort, join). No window
functions: a window partitioned by paragraph content would SORT every
partition; the struct-min aggregate gets the same survivor with a
partial aggregate instead.

Scale notes: the aggregate keys on the paragraph text itself here
(oracle-comparable); the scale path would key on xxhash64(para) so the
shuffle carries 8-byte keys — semantics identical modulo 64-bit
collisions. The rebuild's collect_list is bounded per document
(paragraphs of one doc), not per key. The hottest aggregate key is
the corpus's most-duplicated paragraph; partial aggregation caps its
shuffle contribution at one row per map task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def paragraph_dedup(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """Rebuild each document with corpus-duplicate paragraphs removed.

    Returns (id_col, n_paras, n_kept, text_dedup) for every input
    document; a document whose every paragraph is removed keeps its row
    with n_kept = 0 and empty text.
    """
    paras = (
        df.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(col), sep)).alias("pos", "para"),
        )
        .where(F.length(F.trim(F.col("para"))) > 0)
        .select(id_col, "pos", F.trim(F.col("para")).alias("para"))
    )
    survivors = paras.groupBy("para").agg(
        F.min(F.struct(id_col, "pos")).alias("first")
    ).select(
        F.col(f"first.{id_col}").alias(id_col),
        F.col("first.pos").alias("pos"),
    )
    kept = paras.join(survivors, [id_col, "pos"], "left_semi")

    per_doc = paras.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_paras"))
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            sep,
        ).alias("text_dedup"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_paras", F.lit(0)).cast("long").alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )
