"""Louvain community detection (multi-level modularity optimization).

Not in the reference (scope was triangles/truss/CC); this completes the
community-detection suite the engine already carries (LPA in
labelprop.py, Newman modularity + graph contraction in modularity.py)
with the canonical modularity-greedy algorithm — Blondel, Guillaume,
Lambiotte, Lefebvre, "Fast unfolding of communities in large networks",
J. Stat. Mech. (2008). The sequential algorithm visits vertices one at
a time; that is inherently order-dependent and unparallelizable, so
this is the standard SYNCHRONOUS distributed variant (cf. Lu, Halappa-
navar, Kalyanaraman, "Parallel heuristics for scalable community
detection", Parallel Computing 47, 2015): per round every eligible
vertex evaluates its move against the previous round's state, and all
accepted moves apply at once.

Determinism contract (what makes the driver row value-checkable):

- The modularity gain of moving v from community a to community c is
    dQ = (k_vc - k_va)/m - k_v (vol_c - vol_a + k_v) / (2 m^2)
  with k_vc = weight from v to c, vol_* = weighted-degree sums of the
  PRE-round communities (v counted in a), k_v = weighted degree of v
  (self-loops counted twice). Edge weights are integral (level 0: 1
  per edge; contraction sums counts), so the accept test multiplies by
  2 m^2 > 0 and compares EXACT int64s:
    gain2 = 2m (k_vc - k_va) - k_v (vol_c - vol_a + k_v) > 0
  — no float summation order to diverge between engines. (Headroom:
  2m * k_vc stays inside int64 up to ~1e9 total edge weight.)
- Ties: argmax by (gain2 desc, community-label asc) via a struct-max
  aggregate (no window sort).
- Oscillation damping: synchronous moves can swap adjacent vertices
  forever, so rounds alternate a deterministic parity gate — round r
  moves only vertices with (id + r) % 2 == 0. A level ends after
  `rounds_per_level` rounds or two consecutive zero-move rounds (one
  zero round only proves that parity class is stable).

Per-round plan (the LPA superstep regime): one O(E) shuffle to sum
neighbor-community weights keyed by the center vertex, one O(V)
aggregate for community volumes, the gain join, one struct-max argmax,
and ONE driver action (moved count). Adjacency is hash-partitioned
once per level and cached; 2m is a bounded driver scalar. Levels
contract by summed edge weight (modularity.contract_graph), so level
l+1 runs on O(#communities) vertices — the classic Louvain shrink.

Scale: identical shuffle shape to label_propagation (the same
(id, label)-keyed joins), so the 1e9-edge story carries over; the
volume table is O(V) and broadcast only when small. Skewed hubs touch
the kvc aggregate exactly like LPA's vote count — partial aggregation
collapses per-partition duplicates before the exchange.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.graph.modularity import contract_graph


@dataclass
class LouvainResult:
    labels: DataFrame           # (id, label): label = min original member id
    levels: int                 # levels actually run (>= 1)
    counters: list[dict] = field(default_factory=list)


def _level_rounds(
    ew: DataFrame, rounds: int, level: int, counters: list[dict]
) -> tuple[DataFrame, int]:
    """Run the move phase on one (src, dst, w) graph (self-loops allowed,
    src <= dst). Returns ((id, label) after the rounds, total moves)."""
    nonself = ew.where(F.col("src") != F.col("dst"))
    b = nonself.select("src", "dst", "w").unionByName(
        nonself.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    b = b.repartition("src").persist(StorageLevel.MEMORY_AND_DISK)

    verts = (
        ew.select(F.col("src").alias("id"))
        .unionByName(ew.select(F.col("dst").alias("id")))
        .distinct()
    )
    selfw = (
        ew.where(F.col("src") == F.col("dst"))
        .select(F.col("src").alias("id"), (2 * F.col("w")).alias("sw"))
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("dw"))
    kdeg = (
        verts.join(deg, "id", "left")
        .join(selfw, "id", "left")
        .select(
            "id",
            (
                F.coalesce("dw", F.lit(0)) + F.coalesce("sw", F.lit(0))
            ).alias("k"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # 2m = sum of weighted degrees — one bounded driver scalar per level.
    two_m = int(kdeg.agg(F.sum("k")).collect()[0][0] or 0)
    if two_m == 0:
        b.unpersist()
        return verts.select("id", F.col("id").alias("label")), 0

    labels = verts.select("id", F.col("id").alias("label")).localCheckpoint(
        eager=True
    )
    moved_total = 0
    zero_streak = 0
    for r in range(rounds):
        t0 = time.time()
        vol = (
            labels.join(kdeg, "id")
            .groupBy("label")
            .agg(F.sum("k").alias("vol"))
        )
        # neighbor-community weight per center vertex (one O(E) shuffle;
        # partial agg collapses hub duplicates map-side).
        lab_n = labels.select(
            F.col("id").alias("dst"), F.col("label").alias("nlabel")
        )
        kvc = (
            b.join(lab_n, "dst")
            .groupBy("src", "nlabel")
            .agg(F.sum("w").alias("w_to"))
        )
        own = labels.select(F.col("id").alias("src"), "label")
        tagged = kvc.join(own, "src")
        kva = tagged.where(F.col("nlabel") == F.col("label")).select(
            "src", F.col("w_to").alias("kva")
        )
        vol_c = vol.select(F.col("label").alias("nlabel"), F.col("vol").alias("vc"))
        vol_a = vol.select("label", F.col("vol").alias("va"))
        cand = (
            tagged.where(F.col("nlabel") != F.col("label"))
            .join(kva, "src", "left")
            .join(vol_c, "nlabel")
            .join(vol_a, "label")
            .join(kdeg.select(F.col("id").alias("src"), "k"), "src")
            .select(
                "src",
                "nlabel",
                (
                    F.lit(two_m) * (F.col("w_to") - F.coalesce("kva", F.lit(0)))
                    - F.col("k") * (F.col("vc") - F.col("va") + F.col("k"))
                ).alias("gain2"),
            )
        )
        winners = (
            cand.where(
                (F.col("gain2") > 0) & ((F.col("src") + r) % 2 == 0)
            )
            .groupBy("src")
            .agg(
                F.max(
                    F.struct("gain2", (-F.col("nlabel")).alias("neg"))
                ).alias("wst")
            )
            .select(
                F.col("src").alias("id"), (-F.col("wst.neg")).alias("new_label")
            )
        )
        merged = labels.join(winners, "id", "left_outer").select(
            "id",
            F.coalesce("new_label", "label").alias("label"),
            F.col("new_label").isNotNull().alias("chg"),
        )
        merged = merged.localCheckpoint(eager=False)
        moved = merged.agg(F.count(F.when(F.col("chg"), 1))).collect()[0][0]
        labels = merged.select("id", "label")
        moved_total += moved
        counters.append(
            {
                "level": level,
                "round": r,
                "moved": moved,
                "wall_s": time.time() - t0,
            }
        )
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:  # both parity classes stable => fixpoint
            break
    b.unpersist()
    kdeg.unpersist()
    return labels, moved_total


def louvain(
    edges: DataFrame,
    n_levels: int = 3,
    rounds_per_level: int = 4,
    weight_col: str | None = None,
) -> LouvainResult:
    """Multi-level Louvain over the canonical undirected edge table.

    ``edges``: (src, dst) with src < dst (plus ``weight_col`` if given;
    weights must be integral — the exactness contract above). Returns
    per-vertex community labels canonicalized to the minimum original
    member id (the CC convention), so the output is deterministic and
    engine-independent end-to-end.
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    ew = edges.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        w.alias("w"),
    )
    counters: list[dict] = []
    assign: DataFrame | None = None  # original id -> current community
    levels_run = 0
    for level in range(n_levels):
        labels, moved = _level_rounds(ew, rounds_per_level, level, counters)
        levels_run += 1
        if assign is None:
            assign = labels
        else:
            relabel = labels.select(
                F.col("id").alias("label"), F.col("label").alias("_nl")
            )
            assign = assign.join(relabel, "label").select(
                "id", F.col("_nl").alias("label")
            )
        assign = assign.localCheckpoint(eager=True)
        if moved == 0 or level == n_levels - 1:
            break
        contracted = contract_graph(
            ew, labels, weight_col="w", keep_self_loops=True
        )
        ew = contracted.select(
            F.col("label_a").alias("src"),
            F.col("label_b").alias("dst"),
            F.col("n_edges").alias("w"),
        )
    # canonicalize: community label := min original member id.
    canon = assign.groupBy("label").agg(F.min("id").alias("community"))
    out = assign.join(canon, "label").select(
        "id", F.col("community").alias("label")
    )
    return LouvainResult(labels=out, levels=levels_run, counters=counters)
