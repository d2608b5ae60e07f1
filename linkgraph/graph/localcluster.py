"""Local clustering: personalized-PageRank sweep cut around a seed.

Andersen, Chung & Lang, "Local graph partitioning using PageRank
vectors" (FOCS 2006) — the standard way to extract ONE community
around a seed vertex without touching the rest of a web-scale graph:
rank vertices by ppr(v)/deg(v), sweep prefixes of that order, return
the prefix with minimum conductance

    phi(S) = cut(S) / min(vol(S), vol(V) - vol(S)).

Not in the reference (scope was triangles/truss/CC); composes the
engine's own personalized PageRank with a bounded sweep.

Plan shape (after the PPR supersteps, which dominate):
- score = rank/degree: one join of the rank table with the degree
  table (co-keyed on id).
- top-K by (score desc, id): orderBy().limit(K) — Spark plans
  TakeOrderedAndProject (per-partition heap, K-row driver merge), not
  a full sort; K is a bounded parameter (a local cluster is small by
  definition), so everything downstream is K-row arithmetic.
- cut(S_k) for ALL K prefixes at once via a difference array: each
  edge contributes +1 at the position where it first crosses the
  growing prefix boundary and -1 where it stops crossing (edges with
  one endpoint outside the top-K never stop). That's two broadcast
  joins of the edge table against the K-row position table and one
  K-row aggregate — O(E) scanned once, no per-prefix rescan.
- conductance is integer cut / integer volume: bit-identical
  cross-engine, so the driver oracle value-matches without float
  tolerance games (only the ORDERING uses floats, rounded to 9
  decimals with an id tiebreak).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph.edges import degrees
from linkgraph.graph.pagerank import pagerank


@dataclass
class LocalClusterResult:
    sweep: DataFrame           # (pos, id, degree, volume, cut_edges, conductance)
    members: DataFrame         # (id) of the best (min-conductance) prefix
    best_pos: int
    best_conductance: float


def local_cluster(
    edges: DataFrame,
    seed: int,
    k: int = 60,
    max_iter: int = 20,
    damping: float = 0.85,
) -> LocalClusterResult:
    """Min-conductance sweep cut of the PPR order around ``seed``.

    Fixed ``max_iter`` power-iteration rounds (tol=0) keep the PPR
    vector — and therefore the whole sweep — deterministic and
    oracle-replayable. Prefixes whose complement volume is 0 (the
    prefix swallowed the whole graph) are excluded from the argmin.
    """
    ppr = pagerank(
        edges, sources=[seed], max_iter=max_iter, tol=0.0, damping=damping
    )
    deg = degrees(edges)
    total_vol = deg.agg(F.sum("degree")).collect()[0][0] or 0

    sc = (
        ppr.ranks.where(F.col("rank") > 0)
        .join(deg, "id")
        .select(
            "id",
            F.round(F.col("rank") / F.col("degree"), 9).alias("score"),
            "degree",
        )
    )
    topk = sc.orderBy(F.desc("score"), F.asc("id")).limit(k)
    wpos = Window.orderBy(F.desc("score"), F.asc("id"))
    pos = F.broadcast(
        topk.select(
            F.row_number().over(wpos).alias("pos"), "id", "degree"
        ).localCheckpoint(eager=True)
    )

    e = edges.select("src", "dst")
    ev = e.join(
        pos.select(F.col("id").alias("src"), F.col("pos").alias("pu")),
        "src",
        "left",
    ).join(
        pos.select(F.col("id").alias("dst"), F.col("pos").alias("pv")),
        "dst",
        "left",
    )
    both = ev.where(F.col("pu").isNotNull() & F.col("pv").isNotNull())
    one = ev.where(F.col("pu").isNotNull() != F.col("pv").isNotNull())
    deltas = (
        both.select(F.least("pu", "pv").alias("pos"), F.lit(1).alias("d"))
        .unionByName(
            both.select(F.greatest("pu", "pv").alias("pos"), F.lit(-1).alias("d"))
        )
        .unionByName(
            one.select(F.coalesce("pu", "pv").alias("pos"), F.lit(1).alias("d"))
        )
        .groupBy("pos")
        .agg(F.sum("d").alias("d"))
    )

    wcum = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        pos.join(deltas, "pos", "left")
        .select("pos", "id", "degree", F.coalesce("d", F.lit(0)).alias("d"))
        .select(
            "pos",
            "id",
            "degree",
            F.sum("degree").over(wcum).alias("volume"),
            F.sum("d").over(wcum).alias("cut_edges"),
        )
        .withColumn(
            "conductance",
            # ANSI mode throws on integral division by zero; a prefix
            # that swallowed the whole graph has no conductance -> null
            F.when(
                F.least(F.col("volume"), F.lit(total_vol) - F.col("volume"))
                > 0,
                F.col("cut_edges").cast("double")
                / F.least(F.col("volume"), F.lit(total_vol) - F.col("volume")),
            ),
        )
    ).localCheckpoint(eager=True)

    valid = sweep.where(F.lit(total_vol) - F.col("volume") > 0)
    best = (
        valid.orderBy(F.asc("conductance"), F.asc("pos")).limit(1).collect()
    )
    best_pos = best[0]["pos"] if best else 0
    best_phi = float(best[0]["conductance"]) if best else float("nan")
    members = sweep.where(F.col("pos") <= best_pos).select("id")
    return LocalClusterResult(
        sweep=sweep,
        members=members,
        best_pos=best_pos,
        best_conductance=best_phi,
    )
