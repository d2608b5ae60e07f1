"""Landmark betweenness centrality (Brandes' dependency accumulation).

Not in the reference (scope was triangles/truss/CC); betweenness is the
standard bridge/bottleneck detector for link graphs. Exact betweenness
is O(V*E) (Brandes, "A faster algorithm for betweenness centrality",
J. Math. Sociol. 2001); the big-graph practice is the landmark/pivot
estimator (Brandes & Pich 2007): run Brandes from a bounded seed set
and report the partial dependency sums

    bc(v) = sum over landmarks s != v of delta_s(v),
    delta_s(v) = sum over successors w on the shortest-path DAG of
                 sigma_sv / sigma_sw * (1 + delta_s(w)).

With sources = all vertices this is exact (unnormalized, each
unordered pair counted twice on undirected graphs — callers halve).

Plan shape: the forward phase is the multi-source BFS of bfs.py with a
sigma (shortest-path count) column folded into the frontier aggregate
— sigma(v) = sum of sigma over discovering predecessors, one map-side
combinable aggregate per level, so it costs exactly the BFS joins. The
backward phase walks levels deepest-first: per level one join of the
current level against the (level+1) delta state through the adjacency
(the dist check selects exactly the shortest-path-DAG edges — no
predecessor lists are materialized), one aggregate, one union into the
accumulator. Rounds = 2 * eccentricity of the seed set.

Scale notes: state is (root, id, dist, sigma) hash-partitioned by id,
|roots| a small constant; per-round lineage cut by localCheckpoint.
sigma is a double: path counts overflow int64 on dense graphs long
before they lose double precision relative to the ratio sums they
feed. No sorts anywhere — every per-level step is join + hash agg.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


@dataclass
class BetweennessResult:
    scores: DataFrame           # (id, betweenness)
    dependencies: DataFrame     # (root, id, dist, sigma, delta)
    iterations: int
    counters: list[dict] = field(default_factory=list)


def betweenness_centrality(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
) -> BetweennessResult:
    """Brandes partial betweenness from a landmark set over the
    undirected canonical edge table. Scores cover every vertex reached
    by at least one landmark (interior or not; unreached vertices have
    zero dependency by definition and are omitted)."""
    spark = edges.sparkSession
    roots = sorted({int(s) for s in sources})

    e = edges.select("src", "dst")
    b = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .repartition("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    frontier = spark.createDataFrame(
        [(r, r, 1.0) for r in roots], "root long, id long, sigma double"
    ).localCheckpoint(eager=True)
    visited = frontier.withColumn("dist", F.lit(0)).localCheckpoint(eager=True)

    counters: list[dict] = []
    depth = 0
    # -- forward: BFS with sigma accumulation ------------------------------
    while depth < max_depth:
        t0 = time.time()
        depth += 1
        nxt = (
            frontier.join(b, frontier["id"] == b["src"])
            .groupBy("root", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(visited.select("root", "id"), ["root", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        n_new = nxt.count()
        counters.append(
            {"phase": "forward", "iteration": depth, "frontier": n_new,
             "wall_s": time.time() - t0}
        )
        if n_new == 0:
            depth -= 1
            break
        visited = visited.unionByName(
            nxt.withColumn("dist", F.lit(depth))
        ).localCheckpoint(eager=True)
        frontier = nxt

    # -- backward: dependency accumulation, deepest level first ------------
    deepest = visited.where(F.col("dist") == depth)
    delta_prev = deepest.select(
        "root", "id", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
    acc = visited.where(F.col("dist") == depth).join(
        delta_prev, ["root", "id"]
    ).select("root", "id", "dist", "sigma", "delta")

    for lvl in range(depth - 1, -1, -1):
        t0 = time.time()
        cur = visited.where(F.col("dist") == lvl)
        succ = visited.where(F.col("dist") == lvl + 1).select(
            F.col("root").alias("r2"),
            F.col("id").alias("w"),
            F.col("sigma").alias("sigma_w"),
        )
        dp = delta_prev.select(
            F.col("root").alias("r3"), F.col("id").alias("w2"),
            F.col("delta").alias("delta_w"),
        )
        contrib = (
            cur.join(b, cur["id"] == b["src"])
            .join(succ, (F.col("r2") == cur["root"]) & (F.col("w") == b["dst"]))
            .join(dp, (F.col("r3") == cur["root"]) & (F.col("w2") == F.col("w")))
            .groupBy(cur["root"].alias("root"), cur["id"].alias("id"))
            .agg(
                F.sum(
                    (F.col("sigma") / F.col("sigma_w")) * (1.0 + F.col("delta_w"))
                ).alias("delta")
            )
        )
        delta_cur = (
            cur.join(contrib, ["root", "id"], "left")
            .select(
                "root", "id",
                F.coalesce("delta", F.lit(0.0)).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        counters.append(
            {"phase": "backward", "level": lvl, "wall_s": time.time() - t0}
        )
        acc = acc.unionByName(
            visited.where(F.col("dist") == lvl)
            .join(delta_cur, ["root", "id"])
            .select("root", "id", "dist", "sigma", "delta")
        )
        delta_prev = delta_cur

    acc = acc.localCheckpoint(eager=True)
    scores = (
        acc.where(F.col("id") != F.col("root"))
        .groupBy("id")
        .agg(F.sum("delta").alias("betweenness"))
    )
    b.unpersist()
    return BetweennessResult(
        scores=scores, dependencies=acc, iterations=depth, counters=counters
    )


def edge_betweenness(
    edges: DataFrame,
    sources: list[int],
    max_depth: int = 100,
) -> DataFrame:
    """Brandes edge dependencies from a landmark set — the quantity
    Girvan–Newman community detection peels on (Girvan & Newman, PNAS
    2002): for source s and shortest-path-DAG edge u->w,

        dep_s(u, w) = sigma_s(u) / sigma_s(w) * (1 + delta_s(w)),

    summed over sources and reported per canonical undirected edge.
    One join of the dependency state through the adjacency (the dist
    check selects DAG edges per root) + one aggregate — no extra
    sweeps beyond betweenness_centrality's.
    """
    res = betweenness_centrality(edges, sources, max_depth=max_depth)
    dep = res.dependencies
    e = edges.select("src", "dst")
    b = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    up = dep.select(
        F.col("root").alias("r1"), F.col("id").alias("u"),
        F.col("dist").alias("du"), F.col("sigma").alias("sigma_u"),
    )
    dn = dep.select(
        F.col("root").alias("r2"), F.col("id").alias("w"),
        F.col("dist").alias("dw"), F.col("sigma").alias("sigma_w"),
        F.col("delta").alias("delta_w"),
    )
    terms = (
        up.join(b, up["u"] == b["src"])
        .join(dn, (F.col("r2") == F.col("r1")) & (F.col("w") == b["dst"]))
        .where(F.col("dw") == F.col("du") + 1)
        .select(
            F.least("u", "w").alias("e_src"),
            F.greatest("u", "w").alias("e_dst"),
            (
                (F.col("sigma_u") / F.col("sigma_w")) * (1.0 + F.col("delta_w"))
            ).alias("dep"),
        )
    )
    return terms.groupBy(
        F.col("e_src").alias("src"), F.col("e_dst").alias("dst")
    ).agg(F.sum("dep").alias("betweenness"))
