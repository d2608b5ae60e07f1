"""Maximal independent set via Luby's algorithm with deterministic
hash priorities.

Not in the reference (scope was triangles/truss/CC); MIS is the classic
symmetry-breaking primitive of distributed graph computing (Luby, "A
simple parallel algorithm for the maximal independent set problem",
SIAM J. Comput. 1986) and the building block for scheduling independent
work over a conflict graph (e.g. which repos can be rebuilt
concurrently when edges mark shared state).

Each round r assigns every still-undecided vertex the deterministic
priority

    p(v, r) = (A * ((v * 131 + r) mod P) + B) mod P        (phash family)

and a vertex joins the MIS when its (priority, id) pair is a strict
lexicographic maximum over its undecided neighbors (the id component
makes ties impossible, so the outcome is fully deterministic and
engine-independent — the driver oracle replays the identical rounds).
Winners and their neighbors leave the undecided set; expected O(log n)
rounds.

Plan shape per round: one semi-join restricting the cached bidirected
adjacency to undecided endpoints, one max-aggregate per vertex for the
strongest undecided neighbor (map-side combinable), one anti-join to
shrink the undecided set. State is O(undecided) and shrinks
geometrically; lineage cut by localCheckpoint per round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B


@dataclass
class MISResult:
    members: DataFrame          # (id,)
    iterations: int
    counters: list[dict] = field(default_factory=list)


def _priority(id_col: F.Column, rnd: int) -> F.Column:
    # (A * ((v*131 + r) % P) + B) % P — inner mod keeps the product
    # inside int64 under ANSI mode (A ~ 2^31.3, operand < 2^30).
    inner = (id_col * F.lit(131) + F.lit(rnd)) % F.lit(P1)
    return (F.lit(_SEED_A) * inner + F.lit(_SEED_B)) % F.lit(P1)


def maximal_independent_set(
    edges: DataFrame, max_iter: int = 100
) -> MISResult:
    """Luby MIS over the undirected canonical edge table.

    Returns the member vertex set; by construction no two members are
    adjacent and every non-member has a member neighbor (maximality).
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst")
    b = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    undecided = (
        b.select(F.col("src").alias("id")).distinct().localCheckpoint(eager=True)
    )
    members = spark.createDataFrame([], "id long")

    counters: list[dict] = []
    rnd = 0
    while rnd < max_iter:
        t0 = time.time()
        rnd += 1
        pr = undecided.select("id", _priority(F.col("id"), rnd).alias("p"))
        # adjacency among undecided endpoints only
        eu = (
            b.join(undecided.select(F.col("id").alias("src")), "src", "left_semi")
            .join(undecided.select(F.col("id").alias("dst")), "dst", "left_semi")
        )
        nbr = (
            eu.join(
                pr.select(F.col("id").alias("dst"), "p"), "dst"
            )
            .groupBy("src")
            .agg(F.max(F.struct("p", F.col("dst").alias("id"))).alias("mx"))
            .select(F.col("src").alias("id"), "mx")
        )
        winners = (
            pr.join(nbr, "id", "left")
            .where(
                F.col("mx").isNull()
                | (F.struct("p", "id") > F.col("mx"))
            )
            .select("id")
            .localCheckpoint(eager=True)
        )
        n_win = winners.count()
        if n_win == 0:
            # only possible when undecided was already empty
            rnd -= 1
            break
        removed = winners.unionByName(
            eu.join(winners.select(F.col("id").alias("src")), "src", "left_semi")
            .select(F.col("dst").alias("id"))
        ).distinct()
        members = members.unionByName(winners)
        undecided = undecided.join(removed, "id", "left_anti").localCheckpoint(
            eager=True
        )
        n_left = undecided.count()
        counters.append(
            {"iteration": rnd, "winners": n_win, "undecided": n_left,
             "wall_s": time.time() - t0}
        )
        if n_left == 0:
            break
    members = members.localCheckpoint(eager=True)
    b.unpersist()
    return MISResult(members=members, iterations=rnd, counters=counters)
