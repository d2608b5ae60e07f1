"""HITS (hubs & authorities) as DataFrame joins + aggregates.

Not in the reference (its scope was triangles/truss/CC); semantics are
the published algorithm (Kleinberg, "Authoritative sources in a
hyperlinked environment", JACM 1999) over a DIRECTED link graph:

  per iteration (sequential update, the classic formulation):
    auth(v) <- sum over in-links  u->v of hub(u),   then L2-normalize
    hub(u)  <- sum over out-links u->v of auth(v),  then L2-normalize

Execution shape per superstep: 2 shuffle-agg contributions (the same
links ⋈ state / groupBy pattern as pagerank.py) + 2 L2 norms. The
norms are 1-row aggregates joined back via broadcast crossJoin — NOT
driver collects — so a superstep stays a single Spark job triggered by
the per-round checkpoint materialization; no per-half-step driver
round-trip enters the loop.

Scale notes (same regime as pagerank.py): the links table is
hash-partitioned once and cached; state either broadcasts (single-JVM,
small |V|) or co-partitions on the join key. Hub fan-in is partial-agg
combined map-side, so skewed in-degree costs map memory, not one
reducer. Per-round lineage is cut by the checkpointer.
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
class HITSResult:
    scores: DataFrame           # (id, hub, auth), each L2-normalized
    iterations: int
    counters: list[dict] = field(default_factory=list)


def _l2_normalize(df: DataFrame, col: str) -> DataFrame:
    """Divide `col` by its L2 norm via a broadcast 1-row aggregate
    (crossJoin keeps the whole superstep lazy — no driver action)."""
    norm = df.agg(
        F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_norm")
    )
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


def hits(
    edges: DataFrame,
    max_iter: int = 20,
    checkpointer: Checkpointer | None = None,
) -> HITSResult:
    """HITS over a directed edge table (src -> dst).

    Returns (id, hub, auth) for every vertex, both vectors
    L2-normalized, fixed iteration count (deterministic — mirrors the
    oracle's unrolled recursion; HITS converges geometrically to the
    principal singular vectors, 20 rounds is far past fixpoint on the
    driver graphs).
    """
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="hits")

    links = edges.select("src", "dst")
    vertices = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return HITSResult(
            scores=spark.createDataFrame([], "id long, hub double, auth double"),
            iterations=0,
        )

    small_state = broadcast_state_ok(spark, n, _BROADCAST_STATE_LIMIT)
    # Both half-steps probe the links table: auth groups by dst, hub
    # groups by src. Partition on src (the hub side, probed second and
    # joined on dst output) — in broadcast mode neither half-step
    # shuffles links at all.
    links = links.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)

    # state (id, hub): init hub = 1 (the classic init; normalization
    # makes the scale irrelevant, the direction converges regardless).
    state = vertices.select("id", F.lit(1.0).alias("hub"))
    last = _l2_normalize(
        state.withColumn("auth", F.lit(0.0)), "hub"
    ).select("id", "hub", "auth")

    # Resume: with a durable checkpoint dir, pick up from the last
    # complete superstep (manifest presence == complete); the joint
    # (hub, auth) state is everything the next round reads, so the
    # continuation is bit-identical to an uninterrupted run.
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
        # auth(v) = sum of hub over in-links, then L2 norm. Vertices
        # with no in-links get auth 0 (left join from the vertex set).
        auth_contrib = (
            links.join(probe, links["src"] == state["id"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
        )
        auth = vertices.join(
            F.broadcast(auth_contrib) if small_state else auth_contrib,
            vertices["id"] == auth_contrib["dst"],
            "left_outer",
        ).select("id", F.coalesce("auth", F.lit(0.0)).alias("auth"))
        auth = _l2_normalize(auth, "auth")

        # hub(u) = sum of the NEW auth over out-links (sequential
        # update), then L2 norm.
        hub_contrib = (
            links.join(
                F.broadcast(auth) if small_state else auth,
                links["dst"] == auth["id"],
            )
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
        )
        hub = vertices.join(
            F.broadcast(hub_contrib) if small_state else hub_contrib,
            vertices["id"] == hub_contrib["src"],
            "left_outer",
        ).select("id", F.coalesce("hub", F.lit(0.0)).alias("hub"))
        hub = _l2_normalize(hub, "hub")

        # One checkpoint per superstep carries BOTH vectors and cuts
        # the round's lineage (the only action in the loop).
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
    return HITSResult(scores=last, iterations=it, counters=counters)
