"""k-core decomposition: iterative minimum-degree peeling.

Not in the reference (scope extension alongside PageRank/CC/LPA); the
operator every truss user also reaches for — `calculateTrusses`' own
degree pre-filter (graph-mining-spark MaximalTruss.scala:28) is one
round of exactly this peel. Semantics follow the standard definition
(Seidman 1983): the k-core is the maximal subgraph in which every
vertex has degree >= k; a vertex's core number is the largest k whose
k-core contains it.

Execution shape (per round, bounded): one degree aggregation (2-phase
hash agg with map-side combine), one count action, two anti-joins
dropping edges incident to low-degree vertices (the dropped-vertex set
is explicitly broadcast when it fits — it shrinks to a trickle as the
peel converges), one lineage-cutting checkpoint. This is the k-truss
peel's cheaper sibling: support counting over triangles becomes degree
counting over edges, so a round costs O(E), never O(T).

``core_numbers`` runs the peel at increasing k, reusing each k-core as
the next peel's input — the (k+1)-core is a subgraph of the k-core, so
the graph only shrinks (the same monotone-reuse argument as max_truss's
probe reuse); rounds total O(degeneracy * diameter-ish), each on an
ever-smaller edge set.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import Checkpointer
from linkgraph.graph.edges import degrees

_BROADCAST_DROP_LIMIT = 20_000_000  # same shape/limit rationale as truss


@dataclass
class KCoreResult:
    edges: DataFrame          # edges of the k-core (src, dst)
    n_edges: int
    rounds: int
    counters: list[dict] = field(default_factory=list)


def k_core(
    edges: DataFrame,
    k: int,
    checkpointer: Checkpointer | None = None,
    max_rounds: int = 1000,
) -> KCoreResult:
    """Edges of the k-core of the canonical undirected edge table."""
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job=f"kcore_k{k}")
    if k <= 1:
        n = edges.count()
        return KCoreResult(edges=edges, n_edges=n, rounds=0)

    cur = edges
    counters: list[dict] = []
    rounds = 0
    n_cur: int | None = None
    for rounds in range(1, max_rounds + 1):
        deg = degrees(cur)
        low = deg.where(F.col("degree") < k).select("id")
        n_low = low.count()
        if n_low == 0:
            break
        if n_low <= _BROADCAST_DROP_LIMIT:
            low = F.broadcast(low)
        cur = cur.join(
            low.withColumnRenamed("id", "src"), "src", "left_anti"
        ).join(low.withColumnRenamed("id", "dst"), "dst", "left_anti").select(
            "src", "dst"
        )
        cur = ckpt.save(cur, rounds, {"dropped_vertices": n_low})
        counters.append({"round": rounds, "dropped_vertices": n_low})
    n_cur = cur.count()
    return KCoreResult(edges=cur, n_edges=n_cur, rounds=rounds, counters=counters)


def core_numbers(
    edges: DataFrame,
    k_max: int = 64,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """(id, core) for every vertex of the graph.

    Peels at k = 2, 3, ... over the shrinking core, labelling each
    vertex with the last k whose core retained it; stops when the core
    empties or k_max is hit (k_max bounds oracle recursion depth — the
    true degeneracy of web-scale graphs is far below 64; vertices still
    in the k_max-core are labelled k_max).
    """
    spark = edges.sparkSession
    all_ids = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out = all_ids.select("id", F.lit(1).alias("core"))
    cur = edges
    for k in range(2, k_max + 1):
        res = k_core(cur, k, checkpointer)
        if res.n_edges == 0:
            break
        cur = res.edges.localCheckpoint(eager=True)
        members = (
            cur.select(F.col("src").alias("id"))
            .unionByName(cur.select(F.col("dst").alias("id")))
            .distinct()
        )
        out = (
            out.join(members.withColumn("in_core", F.lit(True)), "id", "left_outer")
            .select(
                "id",
                F.when(F.col("in_core"), F.lit(k)).otherwise(F.col("core")).alias(
                    "core"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return out
