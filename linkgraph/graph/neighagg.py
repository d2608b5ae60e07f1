"""GraphSAGE-style neighbor feature aggregation (k-hop message passing).

Not in the reference (its per-vertex state is scalar: degree/zone/
truss). This is the feature-smoothing primitive a training-data
pipeline runs over a link graph with per-vertex embeddings: each hop
replaces a vertex's feature vector with the mean (or sum/max) of its
neighbors' vectors — the aggregation step of GraphSAGE (Hamilton et
al., NeurIPS 2017) / simplified graph convolution (SGC, Wu et al.,
ICML 2019) without the learned weights.

Plan shape (the 100 TB argument): the feature column is exploded to
scalar state (id, dim, value) ONCE — after that every hop is one
equi-join of the state against the bidirected edge list on the source
id plus one (dst, dim)-keyed aggregate. The per-(dst, dim) mean is
map-side combinable, so a hub with 10^6 neighbors contributes partial
(sum, count) rows per partition, never 10^6 raw rows to one reducer —
the same partial-agg hub dilution pagerank.py relies on; no
collect_list ever materializes a neighborhood, and no UDF runs. State
stays scalar across hops (repacking to arrays costs a per-vertex sort
and buys nothing mid-iteration); ``packed=True`` repacks once at the
end with a bounded per-vertex sort (d elements).

Isolated vertices (no neighbors) drop out of hop output — mean over an
empty neighborhood is undefined; ``include_self=True`` adds a self-loop
so every vertex keeps a row and the aggregate becomes the smoothed
(self + neighbors) mean, the SGC convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGGS = {"mean": F.avg, "sum": F.sum, "max": F.max, "min": F.min}


def _bidirect(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def feature_state(
    features: DataFrame, id_col: str = "id", feat_col: str = "feature"
) -> DataFrame:
    """Explode an array<numeric> feature column to scalar (id, dim, value)."""
    return features.select(
        F.col(id_col).alias("id"),
        F.posexplode(feat_col).alias("dim", "value"),
    ).withColumn("value", F.col("value").cast("double"))


def neighbor_agg(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 1,
    agg: str = "mean",
    id_col: str = "id",
    feat_col: str = "feature",
    include_self: bool = False,
    packed: bool = False,
) -> DataFrame:
    """k-hop neighbor aggregation of per-vertex feature vectors.

    edges (src, dst) are treated as undirected. Returns scalar rows
    (id, dim, value) — or (id, feature array<double>) when ``packed``.

    Reference analogue: none (scalar-state supersteps only); the hop
    loop is the pagerank.py superstep shape with (id, dim) state keys.
    """
    if agg not in _AGGS:
        raise ValueError(f"agg must be one of {sorted(_AGGS)}")
    fn = _AGGS[agg]
    b = _bidirect(edges)
    if include_self:
        # Self-loop set = edge endpoints UNION feature-table ids, so an
        # isolated vertex (features but no edges) keeps its row too —
        # "every vertex keeps a row" means every vertex either side of
        # the inputs knows about.
        ids = (
            b.select(F.col("src").alias("id"))
            .unionByName(features.select(F.col(id_col).alias("id")))
            .distinct()
        )
        b = b.unionByName(
            ids.select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
    state = feature_state(features, id_col, feat_col)
    for _ in range(int(hops)):
        # Rename the join key each hop: state derives from b after the
        # first round, so attribute references would be ambiguous.
        s = state.select(F.col("id").alias("_sid"), "dim", "value")
        state = (
            b.join(s, F.col("src") == F.col("_sid"))
            .groupBy("dst", "dim")
            .agg(fn("value").alias("value"))
            .select(F.col("dst").alias("id"), "dim", "value")
        )
    if packed:
        return state.groupBy("id").agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "value"))
            ).getField("value").alias("feature")
        )
    return state
