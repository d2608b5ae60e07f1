"""Parallel greedy graph coloring (Jones–Plassmann) with deterministic
hash priorities.

Not in the reference (scope was triangles/truss/CC); coloring is the
scheduling dual of MIS — color classes are conflict-free batches, so a
k-coloring of a contention graph runs the whole workload in k phases
(Jones & Plassmann, "A parallel graph coloring heuristic", SIAM J.
Sci. Comput. 1993).

Every vertex gets ONE static priority p(v) from the portable phash
family (ties impossible: comparisons use the (p, id) pair). Per round,
each uncolored vertex whose pair is a strict local max among uncolored
neighbors colors itself with the mex — the smallest color absent from
its already-colored neighborhood. Deterministic, engine-independent,
and the driver oracle replays the identical rounds.

Plan shape per round (Luby's regime, mis.py): one semi-join restricting
the adjacency to uncolored endpoints, one max-aggregate for the
strongest uncolored neighbor, one join + collect_set for the colored
neighborhoods of winners (bounded per vertex by its degree), one
array-mex projection. State shrinks geometrically; expected O(log n)
rounds; colors used <= max_degree + 1 by the greedy invariant.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.graph.mis import _priority


@dataclass
class ColoringResult:
    colors: DataFrame           # (id, color)
    iterations: int
    counters: list[dict] = field(default_factory=list)


def _mex(colors: F.Column) -> F.Column:
    """Smallest non-negative long absent from `colors` (array<long>)."""
    cand = F.sequence(F.lit(0).cast("long"), F.size(colors).cast("long"))
    return F.array_min(F.array_except(cand, colors))


def greedy_coloring(edges: DataFrame, max_iter: int = 200) -> ColoringResult:
    """Jones–Plassmann coloring over the undirected canonical edge
    table. Returns (id, color) for every vertex with degree >= 1."""
    spark = edges.sparkSession
    e = edges.select("src", "dst")
    b = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pr = (
        b.select(F.col("src").alias("id"))
        .distinct()
        .select("id", _priority(F.col("id"), 0).alias("p"))
        .localCheckpoint(eager=True)
    )
    uncolored = pr
    colored = spark.createDataFrame([], "id long, color long")

    counters: list[dict] = []
    rnd = 0
    while rnd < max_iter:
        t0 = time.time()
        rnd += 1
        eu = (
            b.join(uncolored.select(F.col("id").alias("src")), "src", "left_semi")
            .join(uncolored.select(F.col("id").alias("dst")), "dst", "left_semi")
        )
        nbr = (
            eu.join(
                uncolored.select(F.col("id").alias("dst"), "p"), "dst"
            )
            .groupBy("src")
            .agg(F.max(F.struct("p", F.col("dst").alias("id"))).alias("mx"))
            .select(F.col("src").alias("id"), "mx")
        )
        winners = (
            uncolored.join(nbr, "id", "left")
            .where(F.col("mx").isNull() | (F.struct("p", "id") > F.col("mx")))
            .select("id")
        )
        nb_colors = (
            b.join(winners.select(F.col("id").alias("src")), "src", "left_semi")
            .join(colored.select(F.col("id").alias("dst"), "color"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.collect_set("color").alias("cs"))
        )
        newly = (
            winners.join(nb_colors, "id", "left")
            .select(
                "id",
                F.when(F.col("cs").isNull(), F.lit(0).cast("long"))
                .otherwise(_mex(F.col("cs")))
                .alias("color"),
            )
            .localCheckpoint(eager=True)
        )
        n_new = newly.count()
        if n_new == 0:
            rnd -= 1
            break
        colored = colored.unionByName(newly).localCheckpoint(eager=True)
        uncolored = uncolored.join(newly.select("id"), "id", "left_anti").localCheckpoint(
            eager=True
        )
        n_left = uncolored.count()
        counters.append(
            {"iteration": rnd, "colored": n_new, "uncolored": n_left,
             "wall_s": time.time() - t0}
        )
        if n_left == 0:
            break
    b.unpersist()
    return ColoringResult(colors=colored, iterations=rnd, counters=counters)
