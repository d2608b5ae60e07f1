"""Synchronous label propagation (community detection).

Not in the reference (scope extension per BASELINE.json north_star);
semantics follow Raghavan, Albert, Kumara 2007 (near-linear-time
community detection), made deterministic for testability: synchronous
updates, a vertex adopts the most frequent label among its neighbors,
ties broken by the MINIMUM label (no RNG), bounded iterations.

Execution per superstep (bounded): 1 join (labels onto edge endpoints),
1 count aggregate, 1 max-by (argmax via struct-max aggregate — no
window, no sort), 1 driver action for the changed-vertex count. The
tie-break encodes (count desc, label asc) as max(struct(count, -label)),
keeping the argmax a hash aggregate instead of a Window sort at scale.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.checkpoint import Checkpointer

# see pagerank._BROADCAST_STATE_LIMIT — same adaptive broadcast of the
# per-vertex state into the adjacency join while it fits memory.
_BROADCAST_LABELS_LIMIT = 5_000_000


@dataclass
class LPAResult:
    labels: DataFrame           # (id, label)
    iterations: int
    changed: int                # vertices changed in the last round
    counters: list[dict] = field(default_factory=list)


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    checkpointer: Checkpointer | None = None,
) -> LPAResult:
    """Deterministic synchronous LPA over the canonical undirected edges."""
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="lpa")

    adj = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        adj.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    n_vertices = labels.count()
    from linkgraph.graph.partitioning import broadcast_state_ok

    small = broadcast_state_ok(spark, n_vertices, _BROADCAST_LABELS_LIMIT)

    # Loop-invariant adjacency: hash-partition ONCE by the key each
    # superstep groups/joins on, then cache. The cached scan advertises
    # its HashPartitioning to Catalyst (localCheckpoint under AQE does
    # not — it reports UnknownPartitioning), so in broadcast mode every
    # superstep runs with ZERO exchanges: broadcast join preserves the
    # src partitioning, the (id,label) vote count and the per-id argmax
    # both satisfy their required distribution in place. In shuffle mode
    # (vertices > broadcast limit) we partition by dst instead so the
    # labels join co-locates on the big side and only the vote
    # aggregation shuffles.
    part_key = "src" if small else "dst"
    adj = adj.repartition(part_key).persist(StorageLevel.MEMORY_AND_DISK)

    # Resume mid-iteration from the last complete superstep.
    start_it = 1
    latest = ckpt.latest()
    if latest is not None:
        loaded, _manifest = ckpt.load(latest)
        labels = loaded.select("id", "label")
        start_it = latest + 1

    counters: list[dict] = []
    changed = -1
    it = start_it - 1
    for it in range(start_it, max_iter + 1):
        t_step = time.time()
        lab = labels.withColumnRenamed("id", "dst")
        nbr_labels = adj.join(F.broadcast(lab) if small else lab, "dst").select(
            F.col("src").alias("id"), "label"
        )
        votes = nbr_labels.groupBy("id", "label").agg(F.count(F.lit(1)).alias("n"))
        # argmax by (n desc, label asc): max over struct(n, -label).
        winner = votes.groupBy("id").agg(
            F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("w")
        ).select("id", (-F.col("w.neg")).alias("new_label"))
        if small:
            winner = F.broadcast(winner)
        merged = labels.join(winner, "id", "left_outer").select(
            "id",
            F.coalesce("new_label", "label").alias("label"),
            (F.coalesce("new_label", "label") != F.col("label")).alias("chg"),
        )
        # lazy checkpoint + count = ONE job per superstep: the changed-
        # vertex count materializes the checkpointed state it reads.
        merged = ckpt.save(merged, it, eager=False)
        changed = merged.where("chg").count()
        labels = merged.select("id", "label")
        counters.append(
            {"iteration": it, "changed": changed, "wall_s": time.time() - t_step}
        )
        if changed == 0:
            break
    adj.unpersist()
    return LPAResult(labels=labels, iterations=it, changed=changed, counters=counters)
