"""Deterministic random-walk corpus (DeepWalk/node2vec preprocessing).

Embedding pipelines (DeepWalk KDD'14, node2vec KDD'16) consume a
corpus of fixed-length uniform random walks as "sentences". At cluster
scale the walk generator must be (a) shuffle-bounded — one adjacency
join per step, never a per-vertex driver loop — and (b) DETERMINISTIC,
so a re-run (or a resumed superstep) regenerates byte-identical walks:
the "randomness" is a hash of (walk_id, step), not an RNG with state.

Plan per step: walks keyed by current vertex join the CSR-ish
adjacency table (vertex -> sorted neighbor array, built once with one
aggregate and persisted), pick neighbor index

    idx = ((walk_id % P) * A + step * B + C) % P  mod  degree

with pure int64 arithmetic (all intermediates < 2^63) that Spark SQL
and DuckDB evaluate identically — the driver oracle replays the exact
walks. Walks that reach a sink (directed mode) stop early and keep
their prefix. State per step is O(#walks); the path column grows to
the walk length, which is a small constant (the classic settings are
length 40-80).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

P_WALK = 1_000_000_007
A_WALK = 1_103_515_245   # glibc LCG multiplier
B_WALK = 12_345
C_WALK = 1_013_904_223   # Numerical Recipes increment


def _choice_index(walk_id: Column, step: int, degree: Column) -> Column:
    h = (
        (walk_id % F.lit(P_WALK)) * F.lit(A_WALK)
        + F.lit(step * B_WALK + C_WALK)
    ) % F.lit(P_WALK)
    return h % degree


def adjacency_lists(edges: DataFrame, directed: bool = False) -> DataFrame:
    """(id, nbrs) with nbrs the ASCENDING neighbor array — the walk's
    sampling frame. Sorted so the index choice is reproducible
    independent of shuffle order."""
    e = edges.select("src", "dst")
    if not directed:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    return e.distinct().groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_list("dst")).alias("nbrs")
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    directed: bool = False,
) -> DataFrame:
    """(walk_id, path): walks_per_vertex walks from every vertex, each
    up to walk_length edges long (path has walk_length+1 vertices when
    no sink is hit). walk_id = vertex * walks_per_vertex + k.
    """
    adj = adjacency_lists(edges, directed).persist(StorageLevel.MEMORY_AND_DISK)

    starts = adj.select("id")
    walks = starts.select(
        F.explode(
            F.array(*[
                (F.col("id") * walks_per_vertex + k).alias(f"w{k}")
                for k in range(walks_per_vertex)
            ])
        ).alias("walk_id"),
        F.col("id").alias("cur"),
        F.array(F.col("id")).alias("path"),
    )

    done = None
    for step in range(walk_length):
        joined = walks.join(adj, walks["cur"] == adj["id"], "left_outer")
        stopped = joined.where(F.col("nbrs").isNull()).select("walk_id", "path")
        done = stopped if done is None else done.unionByName(stopped)
        # F.get is 0-based and takes a column index.
        nxt = F.get(
            "nbrs",
            _choice_index(F.col("walk_id"), step, F.size("nbrs")).cast("int"),
        )
        walks = (
            joined.where(F.col("nbrs").isNotNull())
            .select(
                "walk_id",
                nxt.alias("cur"),
                F.array_append("path", nxt).alias("path"),
            )
        )
        # Cut lineage every few steps: 40-80 chained joins otherwise
        # build an analysis-time plan that grows quadratically.
        if (step + 1) % 5 == 0:
            walks = walks.localCheckpoint(eager=True)

    out = walks.select("walk_id", "path")
    if done is not None:
        out = out.unionByName(done)
    adj.unpersist()
    return out


def walk_corpus(
    edges: DataFrame,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    directed: bool = False,
) -> DataFrame:
    """The exploded form (walk_id, step, vertex) — the scalar contract
    surface (drivers and sinks canonicalize scalars, not arrays)."""
    w = random_walks(edges, walk_length, walks_per_vertex, directed)
    return w.select(
        "walk_id",
        F.posexplode("path").alias("step", "vertex"),
    )
