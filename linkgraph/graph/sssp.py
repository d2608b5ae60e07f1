"""Multi-source weighted shortest paths (delta-workset Bellman-Ford).

Not in the reference (scope was triangles/truss/CC); completes the
distance toolbox next to hop-count BFS (`bfs.py`): the same landmark
workloads (distance features, weighted closeness, routing-ish
analytics) over a WEIGHTED edge table — here weight = co-occurrence
strength, e.g. shared orders / shared commits.

Algorithm: Bellman-Ford with a frontier delta (the Flink iterateDelta
pattern, graph-mining-flink/.../Truss.scala:163-185, realized as
DataFrames). Per superstep only vertices whose tentative distance
IMPROVED last round relax their out-edges:

  cand(root, id, d') = frontier ⋈ adjacency, d' = dist + w, min per key
  improved           = cand ⋈ dist where d' < dist (or unseen)
  dist               = dist anti-join improved ∪ improved
  frontier           = improved

With positive weights this reaches the true shortest-path fixpoint in
at most |V| rounds (in practice ~weighted-diameter rounds), and the
work per round is O(frontier out-degree) + O(|state|) for the
improvement join — NOT O(V · E) like textbook Bellman-Ford.

Scale notes: state is keyed (root, id), |roots| is a small landmark
constant, so state is O(|roots| · |V|); the bidirected adjacency is
partitioned by src once and persisted, the frontier join co-locates
with it, and per-round lineage is cut by localCheckpoint. Negative
weights are rejected (a negative cycle would never converge and no
link-graph weighting produces one).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class SSSPResult:
    distances: DataFrame        # (root, id, dist: double)
    iterations: int
    counters: list[dict] = field(default_factory=list)


def shortest_paths(
    edges: DataFrame,
    sources: list[int],
    weight_col: str = "weight",
    max_iter: int = 200,
    directed: bool = False,
) -> SSSPResult:
    """Weighted shortest-path distances from each source.

    Returns (root, id, dist) for every vertex reachable from each root
    (roots themselves at dist 0.0). Edge weights must be positive;
    the first superstep validates this with one aggregate and raises
    ``ValueError`` otherwise. ``sources`` is a bounded driver-side
    list (landmark usage), deduplicated.
    """
    spark = edges.sparkSession
    roots = sorted({int(s) for s in sources})

    e = edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    b = e.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)

    bad = b.where(F.col("w") <= 0).count()
    if bad:
        b.unpersist()
        raise ValueError(f"shortest_paths requires positive weights; {bad} edges <= 0")

    dist = (
        spark.createDataFrame([(r, r) for r in roots], "root long, id long")
        .withColumn("dist", F.lit(0.0))
        .localCheckpoint(eager=True)
    )
    frontier = dist

    counters: list[dict] = []
    it = 0
    while it < max_iter:
        t_step = time.time()
        it += 1
        cand = (
            frontier.join(b, frontier["id"] == b["src"])
            .groupBy("root", F.col("dst").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        improved = (
            cand.join(dist, ["root", "id"], "left_outer")
            .where(F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            .select("root", "id", F.col("cand").alias("dist"))
            .localCheckpoint(eager=True)
        )
        n_improved = improved.count()
        counters.append(
            {"iteration": it, "improved": n_improved, "wall_s": time.time() - t_step}
        )
        if n_improved == 0:
            it -= 1
            break
        dist = (
            dist.join(improved, ["root", "id"], "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    b.unpersist()
    return SSSPResult(distances=dist, iterations=it, counters=counters)
