"""Katz centrality: attenuated path-count centrality.

Not in the reference (scope was triangles/truss/CC); Katz (1953) is the
standard centrality between degree (paths of length 1) and eigenvector
centrality (paths of any length): x(v) = beta + alpha * sum over
neighbors u of x(u), i.e. x = sum_k alpha^k * (A^k * beta_vec) —
every walk into v counts, damped by alpha per hop. Converges for
alpha < 1/lambda_max(A); callers on unknown graphs keep alpha well
under 1/max_degree (a lower bound on that criterion).

Plan shape per superstep (the §E regime of PLANS.md): one join of the
per-vertex state against the cached hash-partitioned bidirected
adjacency, one map-side-combinable sum aggregate keyed by dst, one
left join back onto the vertex set (isolated-from-inbound vertices
stay at beta). One driver action per round; lineage cut per round.

The driver oracle replays the identical fixed-round recursion in
DuckDB (same double arithmetic; 6-decimal rounding is far above the
summation-order noise) — the same contract as the pagerank oracle.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class KatzResult:
    scores: DataFrame           # (id, katz)
    iterations: int
    counters: list[dict] = field(default_factory=list)


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.01,
    beta: float = 1.0,
    max_iter: int = 20,
    tol: float = 0.0,
) -> KatzResult:
    """Synchronous Katz iteration over the undirected canonical edge
    table; runs exactly `max_iter` rounds when tol=0 (the oracle mode),
    else stops when the max per-vertex change drops below tol."""
    e = edges.select("src", "dst")
    b = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = b.select(F.col("src").alias("id")).distinct()
    x = verts.select("id", F.lit(float(beta)).alias("katz")).localCheckpoint(
        eager=True
    )

    counters: list[dict] = []
    it = 0
    while it < max_iter:
        t0 = time.time()
        it += 1
        inbound = (
            x.join(b, x["id"] == b["src"])
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("katz").alias("s"))
        )
        nxt = (
            verts.join(inbound, "id", "left")
            .select(
                "id",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("s", F.lit(0.0))
                ).alias("katz"),
            )
            .localCheckpoint(eager=True)
        )
        if tol > 0:
            diff = (
                nxt.join(x.select("id", F.col("katz").alias("prev")), "id")
                .agg(F.max(F.abs(F.col("katz") - F.col("prev"))).alias("d"))
                .collect()[0]["d"]
            )
            counters.append({"iteration": it, "max_delta": diff,
                             "wall_s": time.time() - t0})
            x = nxt
            if diff < tol:
                break
        else:
            counters.append({"iteration": it, "wall_s": time.time() - t0})
            x = nxt
    b.unpersist()
    return KatzResult(scores=x, iterations=it, counters=counters)
