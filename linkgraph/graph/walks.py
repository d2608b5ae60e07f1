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


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 10,
    walks_per_vertex: int = 1,
    p: int = 1,
    q: int = 1,
) -> DataFrame:
    """(walk_id, path): second-order biased walks (node2vec, Grover &
    Leskovec KDD'16) over the undirected graph. Given the previous
    vertex t and current v, the next vertex x is drawn with weight

        return  (x == t):        q
        common  (x adjacent t):  p * q
        far     (otherwise):     p

    — the node2vec alphas (1/p, 1, 1/q) scaled by p*q so every weight
    is an INTEGER: the cumulative-sum pick and the hash draw
    (r = hash(walk_id, step) mod total_weight) stay exact int64
    arithmetic, deterministic and engine-replayable like the uniform
    walks. p == q == 1 degenerates to DeepWalk's uniform walk
    (with a different draw formula than `random_walks`, so the two are
    separately reproducible). Step 0 has no predecessor and is the
    uniform `_choice_index` draw.

    Plan per step: walks ⋈ adjacency (explode to candidates, one row
    per (walk, neighbor)), ONE membership join against the canonical
    edge table on (least, greatest) to classify "common" candidates,
    a per-walk cumulative-sum window (group size = degree of the
    current vertex, the same bound the uniform walk's explode has),
    and the pick filter. The classification join is the honest
    node2vec cost — the alternative (per-edge alias tables) needs
    O(sum_uv deg(u)) preprocessed state, which is exactly what a
    100 TB run cannot hold.
    """
    e = edges.select("src", "dst")
    canon = e.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    adj = adjacency_lists(e, directed=False).persist(StorageLevel.MEMORY_AND_DISK)

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
    # step 0: uniform (no predecessor), same draw as random_walks
    j0 = walks.join(adj, walks["cur"] == adj["id"])
    nxt0 = F.get(
        "nbrs", _choice_index(F.col("walk_id"), 0, F.size("nbrs")).cast("int")
    )
    walks = j0.select(
        "walk_id",
        F.col("cur").alias("prev"),
        nxt0.alias("cur"),
        F.array_append("path", nxt0).alias("path"),
    ).localCheckpoint(eager=True)

    from pyspark.sql import Window

    for step in range(1, walk_length):
        cand = (
            walks.join(adj, walks["cur"] == adj["id"])
            .select("walk_id", "prev", "cur", "path", F.explode("nbrs").alias("x"))
        )
        member = canon.select(
            F.col("a").alias("_ma"), F.col("b").alias("_mb"), F.lit(1).alias("_m")
        )
        cand = cand.join(
            member,
            (F.least("prev", "x") == F.col("_ma"))
            & (F.greatest("prev", "x") == F.col("_mb")),
            "left",
        ).select(
            "walk_id",
            "prev",
            "cur",
            "path",
            "x",
            F.when(F.col("x") == F.col("prev"), F.lit(q))
            .when(F.col("_m").isNotNull(), F.lit(p * q))
            .otherwise(F.lit(p))
            .cast("long")
            .alias("w"),
        )
        wcum = (
            Window.partitionBy("walk_id")
            .orderBy("x")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wtot = Window.partitionBy("walk_id")
        cand = cand.select(
            "*",
            F.sum("w").over(wcum).alias("cum"),
            F.sum("w").over(wtot).alias("total"),
        )
        h = (
            (F.col("walk_id") % F.lit(P_WALK)) * F.lit(A_WALK)
            + F.lit(step * B_WALK + C_WALK)
        ) % F.lit(P_WALK)
        r = h % F.col("total")
        walks = (
            cand.where((F.col("cum") - F.col("w") <= r) & (r < F.col("cum")))
            .select(
                "walk_id",
                F.col("cur").alias("prev"),
                F.col("x").alias("cur"),
                F.array_append("path", F.col("x")).alias("path"),
            )
        )
        if step % 3 == 0:
            walks = walks.localCheckpoint(eager=True)

    out = walks.select("walk_id", "path")
    adj.unpersist()
    canon.unpersist()
    return out
