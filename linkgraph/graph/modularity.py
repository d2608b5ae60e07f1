"""Partition quality: Newman modularity of a vertex labeling.

Not in the reference (scope was triangles/truss/CC); this is the
standard objective for judging the community structures the engine
already produces (label propagation, connected components, truss
components) — Newman & Girvan, "Finding and evaluating community
structure in networks", Phys. Rev. E 69 (2004).

For an undirected graph with m edges and a partition c(.),

  Q = sum over communities c of ( m_c / m  -  (D_c / (2m))^2 )

where m_c = edges with both endpoints in c and D_c = sum of degrees of
vertices in c (the community-sum form of the usual pairwise
definition). Vertices missing from `labels` count as singleton
communities with no internal edges — they contribute only their
degree-sum term, exactly as the pairwise definition implies.

Plan shape: two hash joins of the edge table against the label table
(src side, dst side), one aggregate per label for internal edges, one
for degree sums, one 1-row global aggregate for m joined back by
broadcast. No self-joins, no wedges: O(E) shuffled by label key.

Scale notes: labels is O(V) so the edge<->label joins shuffle — at
1e9 edges these are plain co-partitionable hash joins on id (the same
key the iterative producers of `labels` already partition by, so AQE
reuses the exchange when the label table comes straight out of
CC/LPA). The only broadcast is the 1-row total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def community_stats(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community size / internal-edge / degree-sum / modularity term.

    `edges`: canonical undirected (src, dst); `labels`: (id, label).
    Returns (label, n_vertices, internal_edges, degree_sum,
    modularity_term) — the graph modularity is sum(modularity_term).
    """
    e = edges.select("src", "dst")
    lab = labels.select("id", "label")

    ls = lab.select(F.col("id").alias("src"), F.col("label").alias("label_src"))
    ld = lab.select(F.col("id").alias("dst"), F.col("label").alias("label_dst"))
    tagged = e.join(ls, "src", "left").join(ld, "dst", "left").select(
        F.coalesce("label_src", "src").alias("label_src"),
        F.coalesce("label_dst", "dst").alias("label_dst"),
    )

    internal = (
        tagged.where(F.col("label_src") == F.col("label_dst"))
        .groupBy(F.col("label_src").alias("label"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )

    b = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    per_label = (
        deg.join(lab, "id", "left")
        .select(F.coalesce("label", "id").alias("label"), "degree")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("degree").alias("degree_sum"),
        )
    )

    total = e.agg(F.count(F.lit(1)).alias("m"))
    stats = (
        per_label.join(internal, "label", "left")
        .join(F.broadcast(total))
        .select(
            "label",
            "n_vertices",
            F.coalesce("internal_edges", F.lit(0)).alias("internal_edges"),
            "degree_sum",
            (
                F.coalesce("internal_edges", F.lit(0)) / F.col("m")
                - (F.col("degree_sum") / (2.0 * F.col("m"))) ** 2
            ).alias("modularity_term"),
        )
    )
    return stats


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Graph modularity Q of the labeling, as a 1-row (modularity) frame."""
    return community_stats(edges, labels).agg(
        F.sum("modularity_term").alias("modularity")
    )


def community_conductance(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance: (label, cut_edges, volume, conductance).

    conductance(S) = cut(S) / min(vol(S), 2m - vol(S)) — the standard
    cluster-quality measure (lower = better-separated; the sweep-cut
    objective of localcluster.py, here evaluated per community of a
    given labeling). vol(S) = sum of degrees in S; cut(S) = edges with
    exactly one endpoint in S. Unlabeled vertices default to singleton
    communities (their own id), matching community_stats.

    Plan shape: the SAME two label joins as community_stats (cut from
    the tagged edge list, volume from the degree aggregate), one 1-row
    broadcast total — all map-side-combinable, no windows; a labeling
    with millions of communities shuffles only (label, counters) rows.
    Degenerate guard: communities with vol == 0 (isolated vertices
    under a labeling that names them) get conductance 0.
    """
    e = edges.select("src", "dst")
    lab = labels.select("id", "label")

    ls = lab.select(F.col("id").alias("src"), F.col("label").alias("label_src"))
    ld = lab.select(F.col("id").alias("dst"), F.col("label").alias("label_dst"))
    tagged = e.join(ls, "src", "left").join(ld, "dst", "left").select(
        F.coalesce("label_src", "src").alias("label_src"),
        F.coalesce("label_dst", "dst").alias("label_dst"),
    )
    # A boundary edge contributes 1 to the cut of BOTH its communities.
    cut = (
        tagged.where(F.col("label_src") != F.col("label_dst"))
        .select(
            F.explode(F.array("label_src", "label_dst")).alias("label")
        )
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cut_edges"))
    )

    b = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    vol = (
        deg.join(lab, "id", "left")
        .select(F.coalesce("label", "id").alias("label"), "degree")
        .groupBy("label")
        .agg(F.sum("degree").alias("volume"))
    )
    total = e.agg((2 * F.count(F.lit(1))).alias("_vol_total"))
    return (
        vol.join(cut, "label", "left")
        .withColumn("cut_edges", F.coalesce("cut_edges", F.lit(0)))
        .crossJoin(F.broadcast(total))
        .select(
            "label",
            "cut_edges",
            "volume",
            F.when(
                F.least(F.col("volume"), F.col("_vol_total") - F.col("volume"))
                > 0,
                F.col("cut_edges")
                / F.least(
                    F.col("volume"), F.col("_vol_total") - F.col("volume")
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("conductance"),
        )
    )


def contract_graph(
    edges: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    label_col: str = "label",
    keep_self_loops: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Contract a labeled graph to its supergraph: one vertex per
    label, edge (label_a <= label_b) weighted by the number of original
    edges between the two groups (self-loop rows = internal edges).
    With ``weight_col``, n_edges sums that column instead of counting
    rows — the weighted coarsening Louvain levels need.

    The Louvain/coarsening building block the reference lacks: after
    any community pass (LPA, CC, truss components) — or with an
    external vertex attribute as the label — the contracted graph
    feeds the same operators again at a fraction of the size.

    Plan: two hash joins edge<->labels (same shape and key as
    `community_stats`; broadcast when labels is small, co-keyed
    shuffle otherwise — Catalyst/AQE decide) and ONE map-side
    combinable aggregate. Vertices missing from `labels` stay as
    themselves (singleton groups), so the contraction is total.
    """
    ltype = labels.schema[label_col].dataType
    ls = labels.select(
        F.col(id_col).alias("src"), F.col(label_col).alias("_ls")
    )
    ld = labels.select(
        F.col(id_col).alias("dst"), F.col(label_col).alias("_ld")
    )
    wcol = F.col(weight_col) if weight_col else F.lit(1)
    tagged = (
        edges.select("src", "dst", wcol.alias("_w"))
        .join(ls, "src", "left")
        .join(ld, "dst", "left")
        .select(
            F.coalesce("_ls", F.col("src").cast(ltype)).alias("_a"),
            F.coalesce("_ld", F.col("dst").cast(ltype)).alias("_b"),
            "_w",
        )
    )
    out = (
        tagged.select(
            F.least("_a", "_b").alias("label_a"),
            F.greatest("_a", "_b").alias("label_b"),
            "_w",
        )
        .groupBy("label_a", "label_b")
        .agg(F.sum("_w").alias("n_edges"))
    )
    if not keep_self_loops:
        out = out.where(F.col("label_a") != F.col("label_b"))
    return out
