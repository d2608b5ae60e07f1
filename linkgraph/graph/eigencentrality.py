"""Eigenvector centrality: power iteration toward the principal
eigenvector of the undirected adjacency matrix.

Not in the reference (its scope was triangles/truss/CC — see
/root/reference/graph-mining-spark/src/main/scala/GraphMining.scala:1
for the operator surface this engine extends); eigenvector centrality
(Bonacich 1972) is the fixpoint of x = A x / ||A x||_2 — a vertex is
central when its neighbors are central. It is the alpha -> 1/lambda_max
limit of Katz centrality and the undirected specialization of HITS
(hub == auth when A is symmetric), so the implementation sits exactly
between katz.py (per-round plan shape) and hits.py (lazy L2
normalization).

Plan shape per superstep (PLANS.md §E regime): one join of the vertex
state against the cached hash-partitioned bidirected adjacency, one
map-side-combinable sum keyed by dst, one left join back onto the
vertex set, then the L2 norm as a broadcast 1-row aggregate crossJoin
(hits.py::_l2_normalize — no driver action inside the round; the only
action is the per-round lineage cut). State is O(|V|) rows; the
adjacency is shuffled once at setup and never again.

Determinism contract: fixed `max_iter` rounds (tol=0). The driver
oracle replays the identical recursion in DuckDB with the same double
arithmetic; 6-decimal rounding on an L2-normalized vector is far above
summation-order noise.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.graph.hits import _l2_normalize


@dataclass
class EigenvectorResult:
    scores: DataFrame           # (id, score), L2-normalized
    iterations: int
    counters: list[dict] = field(default_factory=list)


def eigenvector_centrality(
    edges: DataFrame,
    max_iter: int = 20,
    tol: float = 0.0,
) -> EigenvectorResult:
    """Power iteration over the undirected canonical edge table.

    Runs exactly ``max_iter`` synchronous rounds when ``tol=0`` (the
    oracle mode), else stops when the max per-vertex change drops
    below ``tol``. On a connected non-bipartite graph the iterate
    converges to the principal eigenvector; on bipartite components it
    oscillates between the two period-2 limits, which the fixed-round
    contract keeps deterministic (the driver graphs are non-bipartite
    triangle-rich co-purchase graphs).
    """
    e = edges.select("src", "dst")
    b = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = b.select(F.col("src").alias("id")).distinct()
    # Classic init x = 1, normalized; every vertex of the bidirected
    # table has at least one neighbor, so no inbound-less rows exist.
    x = _l2_normalize(
        verts.select("id", F.lit(1.0).alias("score")), "score"
    ).localCheckpoint(eager=True)

    counters: list[dict] = []
    it = 0
    while it < max_iter:
        t0 = time.time()
        it += 1
        inbound = (
            x.join(b, x["id"] == b["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("score").alias("s"))
        )
        nxt = _l2_normalize(
            verts.join(inbound, "id", "left").select(
                "id", F.coalesce("s", F.lit(0.0)).alias("score")
            ),
            "score",
        ).localCheckpoint(eager=True)
        if tol > 0:
            diff = (
                nxt.join(x.select("id", F.col("score").alias("prev")), "id")
                .agg(F.max(F.abs(F.col("score") - F.col("prev"))).alias("d"))
                .collect()[0]["d"]
            )
            counters.append(
                {"iteration": it, "max_delta": diff, "wall_s": time.time() - t0}
            )
            x = nxt
            if diff < tol:
                break
        else:
            counters.append({"iteration": it, "wall_s": time.time() - t0})
            x = nxt
    b.unpersist()
    return EigenvectorResult(scores=x, iterations=it, counters=counters)
