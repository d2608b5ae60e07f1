"""Multi-source BFS: exact hop distances from a seed set, frontier-delta
supersteps.

Not in the reference (scope was triangles/truss/CC); this is the
standard landmark/eccentricity building block for link graphs (e.g.
HADI/HyperANF-style diameter estimation seeds, distance features for
ranking). Semantics: for every (root, vertex) pair where vertex is
reachable from root, the minimum hop count, over the UNDIRECTED
canonical edge table.

Plan shape per superstep (the Flink iterateDelta pattern the reference
uses for CC — graph-mining-flink/.../Truss.scala:163-185 — realized as
DataFrames): the frontier (only vertices DISCOVERED last round) joins
the bidirected adjacency, anti-joins the visited set keyed (root, id),
dedups, and becomes both the next frontier and the visited increment.
Work per round is O(frontier out-degree), NOT O(V) — the workset
shrinks as the BFS saturates, and the loop exits on an empty frontier
(one count action per round, which also feeds the counters).

Scale notes: state is keyed (root, id) and hash-partitioned by id so
the frontier⋈edges join co-locates with the once-partitioned cached
adjacency; |roots| is a small constant (landmarks), so state is
O(|roots| * V) with per-round lineage cut by localCheckpoint. Hub
fan-out in the frontier join is AQE-split; the dedup before the
anti-join bounds the frontier at |roots| * V rows total.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class BFSResult:
    distances: DataFrame        # (root, id, dist)
    iterations: int
    counters: list[dict] = field(default_factory=list)


def bfs_distances(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
) -> BFSResult:
    """Hop distances from each source over the undirected edge table.

    Returns (root, id, dist) for every vertex reachable from each root
    within `max_depth` hops (roots themselves at dist 0). `sources` is
    a bounded driver-side list (landmark usage), deduplicated.
    """
    spark = edges.sparkSession
    roots = sorted({int(s) for s in sources})

    e = edges.select("src", "dst")
    b = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    frontier = spark.createDataFrame(
        [(r, r) for r in roots], "root long, id long"
    ).localCheckpoint(eager=True)
    visited = frontier.withColumn("dist", F.lit(0)).localCheckpoint(eager=True)

    counters: list[dict] = []
    depth = 0
    while depth < max_depth:
        t_step = time.time()
        depth += 1
        nxt = (
            frontier.join(b, frontier["id"] == b["src"])
            .select("root", F.col("dst").alias("id"))
            .distinct()
            .join(visited, ["root", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        n_new = nxt.count()
        counters.append(
            {"iteration": depth, "frontier": n_new, "wall_s": time.time() - t_step}
        )
        if n_new == 0:
            depth -= 1
            break
        visited = visited.unionByName(
            nxt.withColumn("dist", F.lit(depth))
        ).localCheckpoint(eager=True)
        frontier = nxt
    b.unpersist()
    return BFSResult(distances=visited, iterations=depth, counters=counters)


def closeness_centrality(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
) -> DataFrame:
    """Exact closeness + harmonic centrality for a landmark set.

    One aggregate over the multi-source BFS state: per root (with
    n_reached = vertices reached at dist >= 1, i.e. excluding the root),
      closeness = n_reached / sum(dist)
      harmonic  = sum(1 / dist) over reached vertices
    Roots reaching nothing produce no output row.
    Landmark centralities are the standard big-graph practice (exact
    all-pairs closeness is O(V * E)); the BFS cost dominates, the
    aggregate is one shuffle of |roots| * |V| rows.
    """
    res = bfs_distances(edges, sources, max_depth=max_depth)
    d = res.distances.where(F.col("dist") > 0)
    return (
        d.groupBy("root")
        .agg(
            F.count(F.lit(1)).alias("n_reached"),
            (F.count(F.lit(1)) / F.sum("dist")).alias("closeness"),
            F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"),
        )
    )


def eccentricity(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
) -> DataFrame:
    """Per-landmark eccentricity (max hop distance to any reachable
    vertex) plus reach count; max(eccentricity) over any landmark set
    is the standard diameter LOWER bound (double sweep seeds its second
    sweep from the argmax vertex). One aggregate over the multi-source
    BFS state; roots reaching nothing report eccentricity 0.
    """
    res = bfs_distances(edges, sources, max_depth=max_depth)
    return (
        res.distances.groupBy("root")
        .agg(
            F.max("dist").cast("long").alias("eccentricity"),
            F.sum((F.col("dist") > 0).cast("int")).cast("long").alias("n_reached"),
        )
    )
