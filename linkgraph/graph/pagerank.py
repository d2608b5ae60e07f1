"""PageRank: power iteration as DataFrame joins + aggregates.

Not in the reference (its scope was triangles/truss/CC); semantics are
the published algorithm (Page, Brin, Motwani, Winograd 1999) with
damping d=0.85, uniform teleport, and dangling-vertex mass
redistribution, per SURVEY.md §7 M6 / BASELINE.json north_star
("PageRank ... allclose 1e-6 for scores").

Execution shape per superstep (bounded: 1 join + 2 aggregates + 1
driver action):
  contribs = edges ⋈ ranks on src, grouped by dst, sum(rank/out_deg)
  new_rank = (1-d)/N + d * (contrib + dangling_mass/N)
Dangling mass is a scalar aggregate folded into the same action that
computes the convergence delta, so each superstep costs exactly one
driver round-trip.

Scale notes: the rank table is hash-partitioned by id; the contribution
shuffle hashes on dst. Hub fan-in (many src -> one dst) is a partial-agg
(map-side combine) pattern, so hubs cost map-side memory, not a single
reducer — the classic PageRank-on-MapReduce skew trap doesn't apply to
hash aggregation with partial combine. AQE handles residual skew in the
ranks⋈edges join.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.checkpoint import Checkpointer

# Broadcast the (id, rank, out_deg) state into the contribution join
# while it plausibly fits executor memory (~24 B/row): the links table
# then never shuffles and the probe map stays cache-resident. Whether
# broadcasting actually pays also depends on cluster shape — see
# partitioning.broadcast_state_ok (single-JVM local mode only; on real
# executors the per-superstep broadcast rebuild scales with cluster
# size). Past this vertex count the plan always falls back to a
# shuffled hash join — the only option at 1e9-vertex scale.
_BROADCAST_STATE_LIMIT = 5_000_000


@dataclass
class PageRankResult:
    ranks: DataFrame            # (id, rank), sums to 1
    iterations: int
    delta: float                # final max |rank - prev|
    counters: list[dict] = field(default_factory=list)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    directed: bool = False,
    checkpointer: Checkpointer | None = None,
    sources: list[int] | None = None,
    weight_col: str | None = None,
    init_ranks: DataFrame | None = None,
) -> PageRankResult:
    """PageRank over the canonical edge table.

    ``directed=False`` (default, link-graph mode) treats each undirected
    edge as two directed links. Returns ranks summing to 1.

    ``weight_col`` switches to WEIGHTED PageRank: a vertex splits its
    rank across out-links proportionally to edge weight
    (``rank * w / sum(out-weights)``) instead of uniformly. The
    superstep plan is unchanged — ``out_deg`` becomes the out-weight
    sum and the contribution carries ``w`` — so every scale property
    (partitioning, broadcast gating, one action per round) holds.

    ``sources`` switches to PERSONALIZED PageRank: rank initializes
    uniformly over the seed set and all teleport mass — the (1-d) share
    and any dangling mass — returns to the seeds instead of spreading
    uniformly, so ranks measure proximity to the seeds (unreachable
    vertices converge to 0). The seed list is a bounded driver-side
    literal (typical PPR usage: one entity / a handful of seeds); it
    compiles to an `IN` predicate, so no extra join enters the
    superstep plan.

    ``init_ranks`` (an ``(id, rank)`` DataFrame) WARM-STARTS the power
    iteration — the incremental-recompute path: after an edge delta,
    seed from the previous run's converged ranks instead of uniform
    and the iteration re-converges in the few rounds the perturbation
    actually needs, not the full cold-start count (at 10^9 edges the
    difference is the nightly bill). Vertices absent from init get the
    uniform share; the vector is renormalized to sum 1, so the
    fixpoint is identical to a cold start — only the trajectory
    changes. One extra bounded setup action (the normalization sum);
    the superstep plan is untouched.
    """
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="pagerank")

    weighted = weight_col is not None
    if weighted:
        links = edges.select(
            "src", "dst", F.col(weight_col).cast("double").alias("w")
        )
        mirror = links.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    else:
        links = edges.select("src", "dst")
        mirror = links.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    if not directed:
        links = links.unionByName(mirror)

    if directed:
        vertices = (
            links.select(F.col("src").alias("id"))
            .unionByName(links.select(F.col("dst").alias("id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n = vertices.count()
    else:
        # Undirected links are mirrored, so every vertex occurs as src:
        # vertex set + out-degree + (absence of) dangling mass all come
        # from ONE aggregation instead of three setup jobs.
        deg_state = (
            links.groupBy(F.col("src").alias("id"))
            .agg(
                (F.sum("w") if weighted else F.count(F.lit(1))).alias("out_deg")
            )
            .localCheckpoint(eager=True)
        )
        n = deg_state.count()

    # Loop-invariant links: hash-partition ONCE by the key each
    # superstep needs co-location on, then cache (the cached scan
    # advertises HashPartitioning to Catalyst; localCheckpoint under AQE
    # reports UnknownPartitioning and forfeits exchange elimination).
    # Broadcast mode (state fits memory): partition by dst — the state
    # join is broadcast, so the contribution groupBy(dst) then runs with
    # no exchange at all. Shuffle mode: partition by src so the
    # state⋈links join co-locates on the big side; only the contribution
    # aggregate shuffles.
    from linkgraph.graph.partitioning import broadcast_state_ok

    small_state = broadcast_state_ok(spark, n, _BROADCAST_STATE_LIMIT)
    links = links.repartition("dst" if small_state else "src").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if n == 0:
        return PageRankResult(
            ranks=spark.createDataFrame([], "id long, rank double"),
            iterations=0,
            delta=0.0,
        )

    # Personalized mode: rank and every teleport return concentrate on
    # the seed set (member predicate compiles into the projection; the
    # teleport denominator becomes |S|).
    if sources:
        # dedupe: a repeated seed must not shrink the per-seed teleport
        # share (the member predicate is a set; the denominator must be
        # the set's size or total mass silently drops below 1).
        seed_set = sorted({int(s) for s in sources})
        n_tele = len(seed_set)
        member = F.col("id").isin(seed_set)
        init_rank = F.when(member, F.lit(1.0 / n_tele)).otherwise(F.lit(0.0))
    else:
        n_tele = n
        member = None
        init_rank = F.lit(1.0 / n)

    # (id, rank, out_deg); dangling vertices have out_deg null -> 0.
    if directed:
        out_deg = links.groupBy(F.col("src").alias("id")).agg(
            (F.sum("w") if weighted else F.count(F.lit(1))).alias("out_deg")
        )
        state = (
            vertices.join(out_deg, "id", "left_outer")
            .select(
                "id",
                init_rank.alias("rank"),
                F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            )
            .localCheckpoint(eager=True)
        )
        has_dangling = state.where(F.col("out_deg") == 0).limit(1).count() > 0
    else:
        # deg_state is already checkpointed; adding the uniform rank is a
        # narrow projection, and mirrored links mean out_deg >= 1 always.
        state = deg_state.select("id", init_rank.alias("rank"), "out_deg")
        has_dangling = False

    if init_ranks is not None:
        # Warm start: previous ranks where available, uniform share for
        # vertices the init doesn't cover (new since last run); ranks of
        # departed vertices drop out via the inner vertex set. Then
        # renormalize to exact sum 1 so the invariant every later round
        # relies on (mass conservation) holds from round 1.
        # Aggregate duplicate init ids up front: a duplicated id would
        # otherwise fan the state row out through every superstep join
        # (renormalization hides the inflated mass but the final ranks
        # are wrong). Summing duplicates is the one deterministic merge.
        ir = init_ranks.groupBy(F.col("id").alias("_iid")).agg(
            F.sum(F.col("rank").cast("double")).alias("_ir")
        )
        state = (
            state.join(ir, state["id"] == ir["_iid"], "left_outer")
            .select(
                "id",
                F.coalesce("_ir", F.lit(1.0 / n)).alias("rank"),
                "out_deg",
            )
        )
        total = state.agg(F.sum("rank")).collect()[0][0]
        if total is None or total <= 0.0:
            raise ValueError(
                "init_ranks must carry positive total mass over the graph's "
                f"vertices (got total={total}); an all-zero or disjoint warm "
                "start would renormalize to NaN ranks"
            )
        state = state.select(
            "id", (F.col("rank") / F.lit(total)).alias("rank"), "out_deg"
        ).localCheckpoint(eager=True)

    # Dangling mass for round 1 comes from the uniform init (one cheap
    # count); every later round's mass is folded into the SAME aggregate
    # that computes the previous round's convergence delta, so a
    # superstep costs exactly ONE driver action — with tol<=0 (fixed
    # iteration count) even the delta aggregate is skipped and the
    # checkpoint materialization itself is the round's only job. Per-job
    # fixed cost is what caps scaling efficiency of cheap supersteps.
    check_delta = tol > 0.0
    # init dangling mass = sum of initial ranks on dangling vertices
    # (uniform: count/n; personalized: whatever seeds are dangling)
    dangling = (
        state.where(F.col("out_deg") == 0)
        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
        .collect()[0][0]
        if has_dangling
        else 0.0
    )

    # Resume: with a durable checkpoint dir, pick up mid-iteration from
    # the last complete superstep (manifest presence == complete). The
    # dangling mass restarts from the loaded ranks, so the continuation
    # is bit-identical to an uninterrupted run.
    start_it = 1
    latest = ckpt.latest()
    if latest is not None:
        loaded, _manifest = ckpt.load(latest)
        state = loaded.select("id", "rank", "out_deg")
        start_it = latest + 1
        if has_dangling:
            dangling = (
                state.where(F.col("out_deg") == 0)
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .collect()[0][0]
            )

    counters: list[dict] = []
    delta = float("inf")
    it = start_it - 1
    for it in range(start_it, max_iter + 1):
        t_step = time.time()
        probe = F.broadcast(state) if small_state else state
        share = (
            F.col("rank") * links["w"] / F.col("out_deg")
            if weighted
            else F.col("rank") / F.col("out_deg")
        )
        contribs = (
            links.join(probe, links["src"] == state["id"])
            .select("dst", share.alias("_share"))
            .groupBy("dst")
            .agg(F.sum("_share").alias("contrib"))
        )
        base = (1.0 - damping) / n_tele + damping * dangling / n_tele
        base_col = (
            F.when(member, F.lit(base)).otherwise(F.lit(0.0))
            if member is not None
            else F.lit(base)
        )
        if small_state:
            contribs = F.broadcast(contribs)
        new_state = state.join(
            contribs, state["id"] == contribs["dst"], "left_outer"
        ).select(
            "id",
            (base_col + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias(
                "new_rank"
            ),
            "rank",
            "out_deg",
        )
        need_agg = check_delta or has_dangling
        # Shuffle mode + durable checkpoints: write the state BUCKETED
        # on id (bucket count = shuffle partitions, matching the cached
        # links partitioning), so next round's links⋈state and
        # state⋈contribs joins are exchange-free on the state side —
        # a plain parquet scan reports UnknownPartitioning and would
        # re-shuffle O(|V|) rows per round (PLANS.md shuffle-mode gap).
        new_state = ckpt.save(
            new_state.select(
                "id",
                F.col("new_rank").alias("rank"),
                (F.col("new_rank") - F.col("rank")).alias("d"),
                "out_deg",
            ),
            it,
            eager=not need_agg,
            bucket_cols=None if small_state else ["id"],
        )
        if need_agg:
            row = new_state.agg(
                F.max(F.abs("d")).alias("delta"),
                F.sum(F.when(F.col("out_deg") == 0, F.col("rank"))).alias("dm"),
            ).collect()[0]
            delta = row["delta"]
            dangling = (row["dm"] or 0.0) if has_dangling else 0.0
        state = new_state.select("id", "rank", "out_deg")
        counters.append(
            {"iteration": it, "max_delta": delta, "wall_s": time.time() - t_step}
        )
        if check_delta and delta < tol:
            break
    links.unpersist()
    return PageRankResult(
        ranks=state.select("id", "rank"), iterations=it, delta=delta, counters=counters
    )
