"""Near-duplicate document clustering: MinHash pairs -> connected
components -> one canonical survivor per transitive group.

The standard training-data dedup contract (e.g. RefinedWeb, Dolma,
SlimPajama): near-duplication is transitive at corpus scale — if A~B
and B~C, keeping both A and C still leaks the shared passage — so the
verified pair list must be closed into components before picking
survivors. This composes two engine primitives end-to-end:

  minhash_near_duplicates (dedup/minhash.py)  — banded LSH + verify
  connected_components    (graph/components.py) — large-star/small-star

Scale notes: the pair graph is tiny relative to the corpus (only
verified near-dups), so the CC rounds run on O(|pairs|) state; the
cluster assignment returns to the corpus via one broadcast-able join
keyed on doc id. Docs in no pair keep themselves (group_id = own id)
without ever entering the CC iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.dedup.minhash import minhash_near_duplicates
from linkgraph.graph.components import connected_components


def near_duplicate_clusters(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    portable: bool = False,
    **minhash_kwargs,
) -> DataFrame:
    """(id, group_id): transitive near-dup group per document.

    group_id is the minimum doc id of the group (the component label),
    so ``id == group_id`` marks exactly one canonical survivor per
    group — including every unpaired document, which forms its own
    singleton group.
    """
    pairs = minhash_near_duplicates(
        df, col=col, id_col=id_col, threshold=threshold,
        portable=portable, **minhash_kwargs,
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges)  # (id, label = min id)
    ids = df.select(F.col(id_col).cast("long").alias("id")).distinct()
    return ids.join(labels, "id", "left_outer").select(
        "id", F.coalesce("label", "id").alias("group_id")
    )


def deduplicate_near(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    portable: bool = False,
    **minhash_kwargs,
) -> DataFrame:
    """The deduplicated corpus: one survivor (min doc id) per transitive
    near-dup group, all columns preserved."""
    clusters = near_duplicate_clusters(
        df, col=col, id_col=id_col, threshold=threshold,
        portable=portable, **minhash_kwargs,
    )
    keep = clusters.where(F.col("id") == F.col("group_id")).select("id")
    return df.join(keep, df[id_col] == keep["id"], "left_semi")
