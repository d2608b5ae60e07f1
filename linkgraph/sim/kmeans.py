"""Distributed Lloyd's k-means over an embedding column.

The clustering operator a training-data pipeline runs over document
embeddings (topic bucketing, data mixing, IVF cell training at full
corpus scale — `sim.ann._train_centroids` trains on a driver sample;
this is the exact, distributed variant).

Determinism contract (the driver-oracle requirement):
- init: the k vectors with the smallest ids (a bounded orderBy-limit,
  k rows collected);
- assignment: argmin over (squared L2 distance, cluster id) — the
  distance is a SEQUENTIAL fold over dimensions (`F.aggregate` over
  `zip_with`), bit-identical to DuckDB's `list_reduce`, so ties break
  identically cross-engine;
- elements are cast float->double BEFORE any arithmetic (exact), so
  both engines fold the same doubles;
- update: per-dimension mean; a cluster that loses all points keeps
  its previous centroid.

Plan shape per iteration (everything JVM-side, no Python in the hot
path):
- assign: broadcast the k centroids (k·dim doubles — tiny), cross join
  scores k rows per vector inside one whole-stage-codegen projection,
  argmin is a struct-min hash aggregate (map-side combinable).
- update: posexplode(vec) -> (cluster, dim, val) feeding a partial-agg
  avg keyed on (cluster, dim) — the hyperball register pattern: the
  shuffle carries k·dim rows, and a giant cluster's traffic spreads
  over dim reducer keys instead of one.
- one driver collect of k·dim doubles per iteration (bounded, like
  PageRank's per-round scalar).

At 1e9 vectors the cross-join scoring is the standard Lloyd map step
(k·n projected rows, never materialized); for large k the batch-matmul
Arrow kernel in `sim.ann` is the faster non-oracle path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class KMeansResult:
    assignments: DataFrame     # (id, cluster, d2)
    centroids: list[tuple[int, list[float]]]
    iterations: int
    counters: list[dict] = field(default_factory=list)


def _d2(vec, cvec):
    """Sequential-fold squared L2 distance (cross-engine exact)."""
    return F.aggregate(
        F.zip_with(vec, cvec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KMeansResult:
    """Lloyd's algorithm, exactly ``n_iter`` synchronous rounds (no
    early stopping — the fixed-round oracle contract, like pagerank's).

    Returns the assignment produced by the FINAL round's centroids and
    the centroids updated from that assignment.
    """
    spark = emb.sparkSession
    data = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    init = data.orderBy("id").limit(k).collect()
    cents: list[tuple[int, list[float]]] = [
        (i, list(r["vec"])) for i, r in enumerate(init)
    ]
    counters: list[dict] = []
    assigned = None
    for it in range(n_iter):
        cdf = F.broadcast(
            spark.createDataFrame(cents, "cid int, cvec array<double>")
        )
        assigned = (
            data.crossJoin(cdf)
            .withColumn("d2", _d2(F.col("vec"), F.col("cvec")))
            .groupBy("id")
            .agg(F.min(F.struct("d2", "cid", "vec")).alias("m"))
            .select(
                "id",
                F.col("m.cid").alias("cluster"),
                F.col("m.d2").alias("d2"),
                F.col("m.vec").alias("vec"),
            )
        )
        assigned = assigned.localCheckpoint(eager=True)
        new_rows = (
            assigned.select("cluster", F.posexplode("vec").alias("i", "val"))
            .groupBy("cluster", "i")
            .agg(F.avg("val").alias("v"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "v"))),
                    lambda s: s["v"],
                ).alias("cvec")
            )
            .collect()
        )
        got = {r["cluster"]: list(r["cvec"]) for r in new_rows}
        # empty cluster keeps its previous centroid (replicated in SQL)
        cents = [(cid, got.get(cid, old)) for cid, old in cents]
        inertia = assigned.agg(F.sum("d2")).collect()[0][0]
        counters.append({"iter": it, "nonempty": len(got), "inertia": inertia})
    assert assigned is not None
    return KMeansResult(
        assignments=assigned.select("id", "cluster", "d2"),
        centroids=cents,
        iterations=n_iter,
        counters=counters,
    )
