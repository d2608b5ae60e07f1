"""SALSA (Stochastic Approach for Link-Structure Analysis).

Not in the reference (scope was triangles/truss/CC); semantics are the
published algorithm (Lempel & Moran, "SALSA: the stochastic approach
for link-structure analysis", TOIS 2001) over a DIRECTED link graph —
the random-walk cousin of HITS where contributions are degree-
normalized, so scores are stationary distributions of a two-step walk
on the bipartite hub/authority view:

  per iteration (sequential update, mirroring hits.py):
    auth(v) <- sum over in-links  u->v of hub(u)  / outdeg(u),  L1 norm
    hub(u)  <- sum over out-links u->v of auth(v) / indeg(v),   L1 norm

Execution shape per superstep: identical to hits.py — 2 shuffle-agg
contributions + 2 one-row norms broadcast back via crossJoin (no
driver action inside the loop; the per-round checkpoint is the only
action). The degree normalization is joined onto the links table ONCE
before the loop (outdeg on src, indeg on dst), so supersteps touch a
single cached table.

Scale notes: same regime as pagerank.py/hits.py — links hash-
partitioned and cached, state broadcast in single-JVM mode or
co-partitioned on the join key otherwise, map-side partial aggregation
bounds in-degree skew, per-round lineage cut by the checkpointer.

Reference analogue of the loop control: the driver-side fixpoint of
``Truss.scala:125-149``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.checkpoint import Checkpointer
from linkgraph.graph.partitioning import broadcast_state_ok

_BROADCAST_STATE_LIMIT = 5_000_000


@dataclass
class SALSAResult:
    scores: DataFrame           # (id, hub, auth), each L1-normalized
    iterations: int
    counters: list[dict] = field(default_factory=list)


def _l1_normalize(df: DataFrame, col: str) -> DataFrame:
    norm = df.agg(F.sum(F.col(col)).alias("_norm"))
    return (
        df.crossJoin(F.broadcast(norm))
        .withColumn(
            col,
            F.when(F.col("_norm") > 0, F.col(col) / F.col("_norm")).otherwise(
                F.lit(0.0)
            ),
        )
        .drop("_norm")
    )


def salsa(
    edges: DataFrame,
    max_iter: int = 20,
    checkpointer: Checkpointer | None = None,
) -> SALSAResult:
    """SALSA over a directed edge table (src -> dst), fixed rounds.

    Returns (id, hub, auth), both L1-normalized. Fixed iteration count
    keeps the run deterministic and lets the oracle unroll the same
    recursion; like HITS the walk converges geometrically (to
    per-component degree-proportional distributions), so 20 rounds is
    far past fixpoint on the driver graphs.
    """
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="salsa")

    # Parallel edges are legal (they act as multiple walk channels in
    # both the contributions and the degrees), so no dedup pass.
    links = edges.select("src", "dst")
    vertices = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return SALSAResult(
            scores=spark.createDataFrame([], "id long, hub double, auth double"),
            iterations=0,
        )

    small_state = broadcast_state_ok(spark, n, _BROADCAST_STATE_LIMIT)
    outdeg = links.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    indeg = links.groupBy("dst").agg(F.count(F.lit(1)).alias("indeg"))
    # Degrees are joined once; every superstep reuses the same cached,
    # src-partitioned table. Degree tables are |V|-bounded: broadcast
    # under the same policy as the state.
    links = (
        links.join(F.broadcast(outdeg) if small_state else outdeg, "src")
        .join(F.broadcast(indeg) if small_state else indeg, "dst")
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    state = vertices.select("id", F.lit(1.0 / n).alias("hub"))
    last = state.withColumn("auth", F.lit(0.0)).select("id", "hub", "auth")

    start_it = 1
    latest = ckpt.latest()
    if latest is not None:
        loaded, _manifest = ckpt.load(latest)
        last = loaded.select("id", "hub", "auth")
        state = loaded.select("id", "hub")
        start_it = latest + 1

    counters: list[dict] = []
    it = start_it - 1
    for it in range(start_it, max_iter + 1):
        t_step = time.time()
        probe = F.broadcast(state) if small_state else state
        auth_contrib = (
            links.join(probe, links["src"] == state["id"])
            .groupBy("dst")
            .agg(F.sum(F.col("hub") / F.col("outdeg")).alias("auth"))
        )
        auth = vertices.join(
            F.broadcast(auth_contrib) if small_state else auth_contrib,
            vertices["id"] == auth_contrib["dst"],
            "left_outer",
        ).select("id", F.coalesce("auth", F.lit(0.0)).alias("auth"))
        auth = _l1_normalize(auth, "auth")

        hub_contrib = (
            links.join(
                F.broadcast(auth) if small_state else auth,
                links["dst"] == auth["id"],
            )
            .groupBy("src")
            .agg(F.sum(F.col("auth") / F.col("indeg")).alias("hub"))
        )
        hub = vertices.join(
            F.broadcast(hub_contrib) if small_state else hub_contrib,
            vertices["id"] == hub_contrib["src"],
            "left_outer",
        ).select("id", F.coalesce("hub", F.lit(0.0)).alias("hub"))
        hub = _l1_normalize(hub, "hub")

        joint = ckpt.save(
            hub.join(auth, "id").select("id", "hub", "auth"),
            it,
            eager=True,
            bucket_cols=None if small_state else ["id"],
        )
        state = joint.select("id", "hub")
        last = joint
        counters.append({"iteration": it, "wall_s": time.time() - t_step})
    links.unpersist()
    return SALSAResult(scores=last, iterations=it, counters=counters)
