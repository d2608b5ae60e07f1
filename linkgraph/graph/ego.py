"""k-hop ego networks: the induced subgraph around a seed set.

The standard extraction primitive for debugging a vertex's
neighborhood, building GNN mini-batch subgraphs, or shipping a
tractable slice of a 10^9-edge graph to a single-node tool. Built
entirely from existing engine pieces: multi-source BFS bounds the
vertex set (frontier-delta supersteps, O(frontier degree) per round),
then ONE semi-join pass induces the edges. No new iteration, no new
state shape.

Scale notes: the BFS state is O(|roots| * reached); the induced-edge
step is two hash semi-joins of the edge table against the (small)
reached set — broadcast-able whenever the ego ball fits the broadcast
threshold, which is the typical case for small k.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph.bfs import bfs_distances


@dataclass
class EgoNetwork:
    vertices: DataFrame   # (root, id, dist)
    edges: DataFrame      # (root, src, dst) — induced, canonical src < dst


def ego_network(
    edges: DataFrame,
    sources: list[int],
    k: int = 2,
) -> EgoNetwork:
    """Per root: all vertices within k hops and the edges BOTH of whose
    endpoints lie in that ball (the induced subgraph)."""
    res = bfs_distances(edges, sources, max_depth=k)
    ball = res.distances.select("root", "id")
    e = edges.select("src", "dst")
    induced = (
        ball.withColumnRenamed("id", "src")
        .join(e, "src")
        .join(
            ball.withColumnRenamed("id", "dst"),
            ["root", "dst"],
            "left_semi",
        )
        .select("root", "src", "dst")
    )
    return EgoNetwork(vertices=res.distances, edges=induced)
