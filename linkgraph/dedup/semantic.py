"""Semantic deduplication over document embeddings (SemDeDup-style).

The embedding-space analogue of the MinHash pipeline in
``dedup/cluster.py``: instead of lexical shingles, near-duplication is
defined by cosine similarity of embeddings, and the quadratic pair
blowup is bounded by first clustering the corpus — only pairs INSIDE a
k-means cluster are ever scored (Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", 2023). Not in
the reference (graph-mining is triangles/truss/CC — this extends the
training-data-pipeline surface the brief asks for).

Composition of engine primitives, end-to-end deterministic:

  sim.kmeans.kmeans           — fixed-round Lloyd's, exact-fold argmin
  dedup.embedding.cosine_expr — strictly sequential IEEE cosine fold
  graph.components            — large-star/small-star min-id labels

Determinism contract (what makes the driver row value-checkable):
k-means init is the k smallest ids, every distance/cosine is a
sequential double fold (bit-identical in DuckDB), argmin ties break on
cluster id, and groups are labeled by their minimum member id. The
survivor rule is either ``min_id`` (the corpus-dedup convention used by
the MinHash path) or ``outlier`` (SemDeDup's keep-the-vector-farthest-
from-its-centroid, deterministic via the exact d2 with min-id ties).

Scale notes (the 100 TB shape):
- The cluster self-join shuffles on the cluster key; its cost is
  sum(|c|^2) over clusters, which is the SemDeDup knob — k grows with
  the corpus so the expected cluster size stays bounded (k ~ n/1e4 in
  the paper). A degenerate cluster (embedding collapse) would quadratic-
  blow; ``max_cluster_size`` drops such clusters from pairing (recall
  cap, logged in the result counters) rather than letting one reducer
  key absorb |c|^2 rows — the same explicit-cap policy as the LSH
  bucket caps in dedup/minhash.py.
- The pair graph is tiny relative to the corpus, so the CC rounds run
  on O(|pairs|) state; assignments return via one broadcastable join.
- k·dim doubles per Lloyd round is the only driver traffic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.dedup.embedding import cosine_expr
from linkgraph.graph.components import connected_components
from linkgraph.sim.kmeans import kmeans


@dataclass
class SemanticDedupResult:
    groups: DataFrame            # (id, cluster, d2, group_id)
    pairs: DataFrame             # (id_a, id_b, cluster, cosine)
    counters: dict = field(default_factory=dict)


def semantic_dedup_groups(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = None,
) -> SemanticDedupResult:
    """Cluster -> intra-cluster cosine pairs -> transitive groups.

    ``groups``: one row per input vector; ``group_id`` is the minimum
    id of its transitive near-dup group (singletons keep themselves),
    ``cluster``/``d2`` come from the final k-means round. ``pairs``
    carries every verified intra-cluster pair (id_a < id_b).
    """
    res = kmeans(emb, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    vecs = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    asg = res.assignments.select(
        F.col("id").cast("long").alias("id"), "cluster", "d2"
    )
    tagged = asg.join(vecs, "id")
    counters: dict = {"kmeans": res.counters}
    if max_cluster_size is not None:
        sizes = tagged.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
        dropped = sizes.where(F.col("n") > max_cluster_size)
        counters["clusters_dropped"] = dropped.count()  # bounded: <= k rows
        tagged_pairable = tagged.join(
            F.broadcast(dropped.select("cluster")), "cluster", "left_anti"
        )
    else:
        tagged_pairable = tagged
    a = tagged_pairable.select(
        "cluster", F.col("id").alias("id_a"), F.col("vec").alias("vec_a")
    )
    b = tagged_pairable.select(
        "cluster", F.col("id").alias("id_b"), F.col("vec").alias("vec_b")
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", "cluster",
            cosine_expr("vec_a", "vec_b").alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels = connected_components(edges)  # (id, label = min id)
    groups = asg.join(labels, "id", "left_outer").select(
        "id", "cluster", "d2", F.coalesce("label", "id").alias("group_id")
    )
    return SemanticDedupResult(groups=groups, pairs=pairs, counters=counters)


def semantic_deduplicate(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: str = "min_id",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """The deduplicated corpus: one survivor per transitive semantic
    group, all input columns preserved.

    ``keep="min_id"``  — smallest id survives (MinHash-path convention);
    ``keep="outlier"`` — the member farthest from its cluster centroid
    survives (SemDeDup's diversity-preserving rule), ties by min id.
    Both are deterministic: d2 is the exact sequential fold.
    """
    if keep not in ("min_id", "outlier"):
        raise ValueError(f"keep must be min_id or outlier, got {keep!r}")
    res = semantic_dedup_groups(
        emb, k=k, n_iter=n_iter, threshold=threshold,
        id_col=id_col, vec_col=vec_col, max_cluster_size=max_cluster_size,
    )
    g = res.groups
    if keep == "min_id":
        keep_ids = g.where(F.col("id") == F.col("group_id")).select("id")
    else:
        keep_ids = (
            g.groupBy("group_id")
            .agg(F.max(F.struct("d2", (-F.col("id")).alias("neg"))).alias("m"))
            .select((-F.col("m.neg")).alias("id"))
        )
    return emb.join(
        keep_ids, emb[id_col].cast("long") == keep_ids["id"], "left_semi"
    )
