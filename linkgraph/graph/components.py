"""Connected components: large-star / small-star alternation.

Replaces the reference's Cohen-style zone merging
(graph-mining-spark Truss.scala:168-227 — every vertex its own zone,
join edges<->zones, remap each edge's zones to their min, repeat) and
Flink's min-label delta iteration (graph-mining-flink
Truss.scala:156-188). Both converge in O(diameter)-ish rounds; the
two-phase star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — PAPERS.md) converges in O(log n)
rounds of pure DataFrame joins + min-aggregates, which is what survives
a 100 TB edge table.

Output labels are the min vertex id of each component — identical to
the reference's normalized zone labels.

Scale notes:
- every round is two hash aggregations + two joins on vertex id; no
  per-row Python anywhere.
- hub vertices are safe: large-star attaches a hub's (larger) neighbors
  directly to the component min, so star trees flatten instead of
  chaining through hubs.
- convergence is detected with a count + order-insensitive checksum of
  the parent table (two scalar aggregates per round), not a full
  subtract — one action per round keeps driver round-trips bounded per
  superstep.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import Checkpointer


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) both directions -> edges (v, m) for v > u, m = min(N(u) ∪ {u})."""
    b = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = b.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("m"))
    return (
        b.where(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Key each edge on its larger endpoint; attach all smaller neighbors
    (and the key vertex) to m = min(N(u) ∪ {u})."""
    s = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    mins = s.groupBy("src").agg(F.min("dst").alias("m"))
    attach_nbrs = (
        s.join(mins, "src")
        .where(F.col("dst") != F.col("m"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )
    attach_self = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        attach_nbrs.unionByName(attach_self)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive checksum) in a single aggregate pass."""
    # Bounded per-row hash summed as decimal: overflow-proof under ANSI
    # mode at any row count (long-sum of raw xxhash64 overflows).
    sig = F.sum((F.xxhash64("src", "dst") % F.lit(1_000_000_007)).cast("decimal(38,0)"))
    row = edges.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(sig, F.lit(0)).alias("sig")
    ).collect()[0]
    return row["n"], int(row["sig"])


def connected_components(
    edges: DataFrame,
    checkpointer: Checkpointer | None = None,
    max_rounds: int = 50,
) -> DataFrame:
    """Labels (id, label) with label = min vertex id of the component.

    ``edges`` is the canonical undirected table (src < dst). Isolated
    vertices don't appear in an edge table and so get no row (callers
    with a vertex table left-join and coalesce label = id).
    """
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark)
    cur = edges.select("src", "dst")
    prev_sig = None
    start = 0
    # Resume mid-iteration from the last complete superstep: restoring
    # prev_sig from the loaded table reproduces the exact loop state an
    # uninterrupted run would have after that round.
    latest = ckpt.latest()
    if latest is not None:
        cur, _manifest = ckpt.load(latest)
        prev_sig = _signature(cur)
        start = latest + 1
    for step in range(start, max_rounds):
        cur = _small_star(_large_star(cur))
        # lazy checkpoint + signature = ONE job per round (the signature
        # aggregate materializes the checkpoint it reads).
        cur = ckpt.save(cur, step, eager=False)
        sig = _signature(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    # Fixpoint: star edges (child -> root). Labels = child rows + roots.
    child = cur.select(F.col("src").alias("id"), F.col("dst").alias("label"))
    roots = cur.select(F.col("dst").alias("id"), F.col("dst").alias("label"))
    return child.unionByName(roots).distinct()


def connected_components_delta(
    edges: DataFrame,
    checkpointer: Checkpointer | None = None,
    max_rounds: int = 200,
    counters_out: list | None = None,
) -> DataFrame:
    """Min-label propagation with a DELTA WORKSET — the Flink reference's
    ``iterateDelta`` scheme (graph-mining-flink Truss.scala:156-188):
    each round only the vertices whose label improved last round send
    (neighbor, label) messages; a vertex keeps min(current, incoming).

    O(diameter) rounds vs large-star/small-star's O(log n), but each
    round costs O(edges incident to the workset), which decays fast on
    real graphs — the workset-pattern exemplar for this engine.
    ``connected_components`` remains the scale default; both reach the
    identical labeling (pinned in tests/test_components.py).
    """
    from pyspark.storagelevel import StorageLevel

    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="cc_delta")
    adj = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Loop-invariant adjacency co-located with the workset join key.
    adj = adj.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        adj.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    workset = labels  # round 1: every vertex announces its own id
    for step in range(max_rounds):
        t_step = time.time()
        msgs = adj.join(workset.withColumnRenamed("id", "src"), "src").select(
            F.col("dst").alias("id"), "label"
        )
        incoming = msgs.groupBy("id").agg(F.min("label").alias("new_label"))
        merged = labels.join(incoming, "id", "left_outer").select(
            "id",
            F.least(F.col("label"), F.coalesce("new_label", "label")).alias("label"),
            (F.coalesce("new_label", "label") < F.col("label")).alias("improved"),
        )
        merged = ckpt.save(merged, step, eager=False)
        n_improved = merged.where("improved").count()
        workset = merged.where("improved").select("id", "label")
        labels = merged.select("id", "label")
        if counters_out is not None:
            counters_out.append(
                {
                    "round": step,
                    "workset": n_improved,
                    "wall_s": round(time.time() - t_step, 3),
                }
            )
        if n_improved == 0:
            break
    adj.unpersist()
    return labels


def incremental_components(
    prev_labels: DataFrame,
    delta_edges: DataFrame,
    checkpointer: Checkpointer | None = None,
) -> DataFrame:
    """Merge an edge delta into an existing labeling — incremental CC.

    Contraction argument: every vertex of a previous component is
    connected, so the old graph is equivalent (for connectivity) to
    its quotient — one supernode per previous label. Only the delta
    edges mapped through the labeling enter the new CC run; the
    original edge table is never touched. At 10^9 edges with a
    nightly delta of 10^6 the incremental run processes ~10^6 rows
    plus one labels-sized join to re-emit the final mapping, not the
    full graph. Because previous labels are component-min vertex ids,
    the composed labeling is IDENTICAL to a full recompute on
    (old ∪ delta) — min over merged supernode labels is the global
    min id (pinned in test_components).

    Returns (id, label) covering every previously-labeled vertex plus
    every delta endpoint.
    """
    base = prev_labels.select("id", "label")
    ends = (
        delta_edges.select(F.col("src").alias("id"))
        .unionByName(delta_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    new_v = ends.join(base, "id", "left_anti").select(
        "id", F.col("id").alias("label")
    )
    all_labels = base.unionByName(new_v).localCheckpoint(eager=True)

    # Delta edges between supernodes (previous labels); self-quotient
    # edges vanish, duplicates collapse — the contracted graph is tiny.
    lmap = all_labels.select(
        F.col("id").alias("_mid"), F.col("label").alias("_ml")
    )
    e = delta_edges.select("src", "dst")
    e = (
        e.join(lmap, e["src"] == lmap["_mid"])
        .select(F.col("_ml").alias("ls"), "dst")
        .join(lmap, F.col("dst") == lmap["_mid"])
        .select("ls", F.col("_ml").alias("ld"))
        .where(F.col("ls") != F.col("ld"))
        .select(
            F.least("ls", "ld").alias("src"), F.greatest("ls", "ld").alias("dst")
        )
        .distinct()
    )
    quotient = connected_components(e, checkpointer=checkpointer)
    q = quotient.select(
        F.col("id").alias("_qid"), F.col("label").alias("_qlabel")
    )
    return all_labels.join(
        q, all_labels["label"] == q["_qid"], "left_outer"
    ).select("id", F.coalesce("_qlabel", "label").alias("label"))


def component_of_edges(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Tag each edge with its component label: (component, src, dst).

    Mirrors the reference's final zone->edge mapping join
    (graph-mining-spark Truss.scala:157-165). src and dst share a label
    by construction, so one join on src suffices.
    """
    return edges.join(
        labels.withColumnRenamed("id", "src").withColumnRenamed("label", "component"),
        "src",
    ).select("component", "src", "dst")
