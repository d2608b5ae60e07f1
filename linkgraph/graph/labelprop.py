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

Delta workset (the reference's own optimization — its Flink side
propagates only changed vertices, graph-mining-flink Truss.scala:163-185
``iterateDelta``): a vertex's vote multiset is unchanged unless some
neighbor changed label last round, so once the changed fraction falls
below _DELTA_FRACTION each round recomputes votes ONLY for vertices
with a changed neighbor ("candidates") — everyone else provably keeps
their label. Late converging rounds then cost O(edges incident to
candidates), not O(E). The fixpoint is bit-identical to full
recomputation (pinned in tests/test_labelprop.py).

Period-2 termination: synchronous LPA on bipartite-like structure
famously never reaches a fixpoint — vertices flip between two labels
every round (measured on the 37M-edge import graph: ~100% of vertices
"change" per round forever while the state two rounds back is nearly
identical; symmetric threshold dynamics have eventual period <= 2,
Goles & Olivos 1980). Because the update is deterministic, observing
state(t+1) == state(t-1) PROVES the orbit is a terminal 2-cycle: every
later state alternates between the two phases and the plain `changed`
count never reaches 0. The loop therefore carries each vertex's
previous label, folds a second conditional count (label vs two rounds
back) into the SAME per-round aggregate (still exactly one driver
action), and on period-2 detection stops and canonicalizes each
vertex's label to the MINIMUM of its two phase labels — deterministic,
order-independent, and identical for both phase alignments.
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

# Switch to the delta workset once fewer than this fraction of vertices
# changed last round: below it the candidate semi-join prunes more edge
# scans than its own distinct costs; above it full recompute is cheaper
# (the candidate set would be ~the whole graph anyway).
_DELTA_FRACTION = 0.25


@dataclass
class LPAResult:
    labels: DataFrame           # (id, label)
    iterations: int
    changed: int                # vertices changed in the last round
    counters: list[dict] = field(default_factory=list)
    oscillating: bool = False   # stopped at a period-2 orbit, not a fixpoint


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

    # Resume mid-iteration from the last complete superstep. The changed
    # set is not persisted, so the first resumed round recomputes votes
    # for all vertices (a full round is always a safe over-approximation
    # of a delta round).
    start_it = 1
    changed_ids: DataFrame | None = None  # None == "all" (full round)
    # prev = each vertex's label one round earlier (period-2 detection);
    # initialized to the current label, under which round 1 can only
    # report chg2 == 0 if it is already a true fixpoint.
    latest = ckpt.latest()
    if latest is not None:
        loaded, _manifest = ckpt.load(latest)
        cols = set(loaded.columns)
        labels = loaded.select(
            "id", "label", *( ["prev"] if "prev" in cols else [] )
        )
        if "prev" not in cols:  # checkpoint from an older run
            labels = labels.withColumn("prev", F.col("label"))
        start_it = latest + 1
    else:
        labels = labels.withColumn("prev", F.col("label"))

    counters: list[dict] = []
    changed = n_vertices
    oscillating = False
    it = start_it - 1
    for it in range(start_it, max_iter + 1):
        t_step = time.time()
        use_delta = (
            changed_ids is not None and changed <= n_vertices * _DELTA_FRACTION
        )
        if use_delta:
            # Vertices owning at least one changed neighbor; everyone
            # else keeps their label (their vote multiset is unchanged).
            chg_dst = changed_ids.withColumnRenamed("id", "dst")
            candidates = (
                adj.join(F.broadcast(chg_dst) if small else chg_dst, "dst")
                .select("src")
                .distinct()
            )
            if small:
                voters = adj.join(F.broadcast(candidates), "src", "left_semi")
            else:
                # adj is dst-partitioned in shuffle mode, so a semi-join
                # keyed on src would reshuffle the whole edge table every
                # delta round. The mirrored edge set is symmetric —
                # {(u,v): u in C} == swap({(v,u): u in C}) — so key the
                # semi-join on dst (co-located, candidates shuffle O(|C|))
                # and swap the surviving rows back.
                cand_dst = candidates.withColumnRenamed("src", "dst")
                voters = adj.join(cand_dst, "dst", "left_semi").select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
        else:
            voters = adj
        lab = labels.select("id", "label").withColumnRenamed("id", "dst")
        nbr_labels = voters.join(F.broadcast(lab) if small else lab, "dst").select(
            F.col("src").alias("id"), "label"
        )
        votes = nbr_labels.groupBy("id", "label").agg(F.count(F.lit(1)).alias("n"))
        # argmax by (n desc, label asc): max over struct(n, -label).
        winner = votes.groupBy("id").agg(
            F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("w")
        ).select("id", (-F.col("w.neg")).alias("new_label"))
        if small:
            winner = F.broadcast(winner)
        new = F.coalesce("new_label", "label")
        merged = labels.join(winner, "id", "left_outer").select(
            "id",
            new.alias("label"),
            F.col("label").alias("prev"),
            (new != F.col("label")).alias("chg"),
            (new != F.col("prev")).alias("chg2"),
        )
        # lazy checkpoint + one aggregate = ONE job per superstep: the
        # conditional counts (changed vs last round, changed vs two
        # rounds back) materialize the checkpointed state they read.
        # Shuffle mode + durable checkpoints: bucket the label state on
        # id so next round's joins skip the per-round state exchange
        # (see pagerank / PLANS.md shuffle-mode gap).
        merged = ckpt.save(
            merged, it, eager=False, bucket_cols=None if small else ["id"]
        )
        row = merged.agg(
            F.count(F.when(F.col("chg"), 1)).alias("c1"),
            F.count(F.when(F.col("chg2"), 1)).alias("c2"),
        ).collect()[0]
        changed, changed2 = row["c1"], row["c2"]
        changed_ids = merged.where("chg").select("id")
        labels = merged.select("id", "label", "prev")
        counters.append(
            {
                "iteration": it,
                "changed": changed,
                "changed_vs_2_rounds_ago": changed2,
                "mode": "delta" if use_delta else "full",
                "wall_s": time.time() - t_step,
            }
        )
        if changed == 0:
            break
        if changed2 == 0:
            # state(t+1) == state(t-1): a terminal period-2 orbit (the
            # update is deterministic, so both phases now alternate
            # forever and `changed` never reaches 0). Canonicalize each
            # oscillating vertex to the minimum of its two phase labels
            # — identical whichever phase the loop stopped in.
            oscillating = True
            labels = merged.select(
                "id", F.least("label", "prev").alias("label"), "prev"
            )
            break
    adj.unpersist()
    return LPAResult(
        labels=labels.select("id", "label"),
        iterations=it,
        changed=changed,
        counters=counters,
        oscillating=oscillating,
    )


def seeded_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 4,
) -> DataFrame:
    """Semi-supervised label propagation: fixed seed labels spread to
    unlabeled vertices (Zhu & Ghahramani 2002, hard-label variant).

    ``seeds``: (id, label) — these vertices keep their label forever.
    Every other vertex starts unlabeled (NULL) and, each synchronous
    round, adopts the most frequent label among its LABELED neighbors
    (ties by minimum label), carrying its previous label when no
    neighbor is labeled yet. Exactly ``n_rounds`` rounds — the
    fixed-round oracle contract (katz/eigenvector style), so the
    result is a pure function of (edges, seeds, n_rounds); vertices
    further than n_rounds hops from every seed stay NULL.

    Per round: one O(E) join+vote aggregate and one left join — the
    plain-LPA superstep shape minus the delta/oscillation machinery
    (labels here can only flip between CONCRETE labels while
    information flows; the fixed round count bounds that). Returns
    (id, label) with label nullable.
    """
    adj = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = adj.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    sd = seeds.select(
        F.col("id").alias("id"), F.col("label").alias("seed_label")
    )
    labels = (
        adj.select(F.col("src").alias("id"))
        .distinct()
        .join(sd, "id", "left_outer")
        .select("id", F.col("seed_label").alias("label"),
                F.col("seed_label").isNotNull().alias("is_seed"))
        .localCheckpoint(eager=True)
    )
    for _ in range(n_rounds):
        lab = labels.where(F.col("label").isNotNull()).select(
            F.col("id").alias("dst"), F.col("label").alias("nl")
        )
        votes = (
            adj.join(lab, "dst")
            .groupBy(F.col("src").alias("id"), "nl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        winner = (
            votes.groupBy("id")
            .agg(F.max(F.struct("n", (-F.col("nl")).alias("neg"))).alias("w"))
            .select("id", (-F.col("w.neg")).alias("new_label"))
        )
        labels = (
            labels.join(winner, "id", "left_outer")
            .select(
                "id",
                F.when(F.col("is_seed"), F.col("label"))
                .otherwise(F.coalesce("new_label", "label"))
                .alias("label"),
                "is_seed",
            )
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return labels.select("id", "label")
