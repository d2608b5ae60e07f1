"""Strongly connected components of a DIRECTED graph: FW-BW-MIN
(forward/backward min-label) decomposition.

Not in the reference (its CC is undirected zone merging,
graph-mining-spark Truss.scala:168-227); semantics follow the published
multi-pivot coloring scheme (Orzan 2004; Hong, Rodia & Olukotun,
"On fast parallel detection of strongly connected components", SC 2013):

  repeat over the UNLABELED subgraph:
    F(v) = min id with a directed path TO v   (forward min-label fixpoint)
    B(v) = min id v has a directed path to    (backward fixpoint, same
                                               plan on reversed edges)
    F(v) == B(v) == m  <=>  m reaches v and v reaches m
                       <=>  v is in SCC(m): label and remove those.

Every round labels at least one whole SCC per weakly-connected region
(the one containing the region's min id) — in practice most of the
graph falls in the first round or two. DAG-shaped regions are the
degenerate case (one FW-BW round per topological layer), so each outer
round first runs the SC'13 TRIM loop: any active vertex with no
in-edge or no out-edge inside the active subgraph is a singleton SCC
and is labeled immediately; trim repeats to fixpoint at ~3 cheap jobs
per layer (vs 2 full fixpoints per FW-BW round), fully dissolving
acyclic regions before the expensive phase ever runs. FW-BW then only
sees vertices with both degrees >= 1 — i.e. graphs that actually
contain cycles.

Plan shape: each inner fixpoint is the delta-workset min-label loop of
components.connected_components_delta, restricted to one direction —
only vertices whose label improved last round send messages, so a
round costs O(edges touching the workset), not O(E). The adjacency is
hash-partitioned once per direction and reused across ALL outer rounds
(the unlabeled filter is a semi-join against the shrinking active set,
not a re-partition).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class SCCResult:
    labels: DataFrame           # (id, label) — label = min id of the SCC
    rounds: int                 # outer FW-BW rounds
    counters: list[dict] = field(default_factory=list)


def _min_label_fixpoint(
    adj: DataFrame, active: DataFrame, max_rounds: int
) -> DataFrame:
    """Delta-workset min-label propagation along `adj` (src -> dst),
    restricted to the `active` vertex set. Returns (id, label) where
    label = min active id with a directed path to id (incl. itself)."""
    sub = adj.join(active.withColumnRenamed("id", "src"), "src", "left_semi").join(
        active.withColumnRenamed("id", "dst"), "dst", "left_semi"
    )
    labels = active.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=True
    )
    workset = labels
    for _ in range(max_rounds):
        msgs = sub.join(workset.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "label"
        )
        incoming = msgs.groupBy("id").agg(F.min("label").alias("new_label"))
        merged = labels.join(incoming, "id", "left_outer").select(
            "id",
            F.least(F.col("label"), F.coalesce("new_label", "label")).alias("label"),
            (F.coalesce("new_label", "label") < F.col("label")).alias("improved"),
        ).localCheckpoint(eager=False)
        n_improved = merged.where("improved").count()
        workset = merged.where("improved").select("id", "label")
        labels = merged.select("id", "label")
        if n_improved == 0:
            break
    return labels


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 50,
    inner_max_rounds: int = 200,
) -> SCCResult:
    """SCC labels over a directed edge table (src -> dst).

    Returns (id, label) for every vertex; label = the smallest vertex
    id in its SCC (singleton SCCs label themselves).
    """
    spark = edges.sparkSession

    e = edges.select("src", "dst")
    fwd = e.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    bwd = (
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    active = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done = spark.createDataFrame([], "id long, label long")

    counters: list[dict] = []
    rounds = 0
    while rounds < max_rounds:
        t_step = time.time()
        n_active = active.count()
        if n_active == 0:
            break
        rounds += 1
        # TRIM loop: peel vertices that cannot be on a cycle (no
        # in-edge or no out-edge within the active subgraph) — each is
        # its own SCC. Dissolves DAG regions layer by layer at a few
        # cheap jobs per layer, so FW-BW only runs on cyclic residue.
        n_trimmed = 0
        while True:
            sub = fwd.join(
                active.withColumnRenamed("id", "src"), "src", "left_semi"
            ).join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            has_in = sub.select(F.col("dst").alias("id")).distinct()
            has_out = sub.select(F.col("src").alias("id")).distinct()
            keep = (
                active.join(has_in, "id", "left_semi")
                .join(has_out, "id", "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = active.join(keep, "id", "left_anti")
            done = done.unionByName(
                trimmed.select("id", F.col("id").alias("label"))
            ).localCheckpoint(eager=True)
            n_keep = keep.count()
            n_round_trim = n_active - n_trimmed - n_keep
            n_trimmed += n_round_trim
            active = keep
            if n_round_trim == 0 or n_keep == 0:
                break
        if n_active - n_trimmed == 0:
            counters.append(
                {
                    "round": rounds,
                    "active": n_active,
                    "trimmed": n_trimmed,
                    "labeled": 0,
                    "wall_s": round(time.time() - t_step, 3),
                }
            )
            break
        fl = _min_label_fixpoint(fwd, active, inner_max_rounds)
        bl = _min_label_fixpoint(bwd, active, inner_max_rounds)
        joined = fl.join(
            bl.withColumnRenamed("label", "blabel"), "id"
        ).localCheckpoint(eager=True)
        labeled = joined.where(F.col("label") == F.col("blabel")).select(
            "id", "label"
        )
        n_labeled = labeled.count()
        counters.append(
            {
                "round": rounds,
                "active": n_active,
                "trimmed": n_trimmed,
                "labeled": n_labeled,
                "wall_s": round(time.time() - t_step, 3),
            }
        )
        done = done.unionByName(labeled).localCheckpoint(eager=True)
        active = (
            joined.where(F.col("label") != F.col("blabel"))
            .select("id")
            .localCheckpoint(eager=True)
        )
    fwd.unpersist()
    bwd.unpersist()
    return SCCResult(labels=done, rounds=rounds, counters=counters)
