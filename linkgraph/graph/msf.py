"""Borůvka minimum spanning forest over a weighted edge table.

Not in the reference (scope was triangles/truss/CC) — the classic
O(log V)-round distributed MST construction (Borůvka 1926; the
standard parallel choice because every round is two joins and one
min-aggregate, no priority queue): each round every component picks
its lightest outgoing edge, the picked edges merge components, repeat
until no component has an outgoing edge.

Determinism: ties are broken by the total order (weight, src, dst) —
a struct-min — which makes the forest UNIQUE regardless of execution
order, so tests replay it exactly with a Kruskal reference using the
same key.

Plan shape per round (everything Catalyst built-ins):
  - relabel:   edges ⋈ labels (src side) ⋈ labels (dst side) — the two
               hash joins every community op here uses; inter-component
               edges only (`lsrc != ldst` filter drops intra edges from
               ALL later rounds, so the live edge set shrinks as
               components merge).
  - pick:      per-component min over a (weight, src, dst, lsrc, ldst)
               struct, emitted from BOTH endpoints' perspectives — one
               map-side-combinable aggregate keyed by component id.
  - contract:  the picked edges, viewed over component ids, form a
               sparse component graph (<= one edge per component);
               `connected_components` (large-star/small-star) merges the
               chains — the inner loop is O(log C) rounds over a table
               whose size is the CURRENT component count, which halves
               (at least) every outer round, so total inner work is a
               geometric series dominated by round 1.
  - one driver action per round: the number of picked edges (0 ==
    fixpoint). Labels are localCheckpoint-cut each round.

Scale notes: the edge table shuffles on label keys only; hubs are
diluted because the pick aggregate is partial (map-side min per
component before the exchange). At 1e9 edges the relabel joins are the
same co-keyed shuffles PageRank's state join runs; no sort, no window,
no per-row Python anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph.components import connected_components


@dataclass
class MSFResult:
    forest: DataFrame          # (src, dst, weight) — the unique MSF
    labels: DataFrame          # (id, label) final component per vertex
    n_edges: int               # forest size == n_vertices - n_components
    rounds: int
    counters: list[dict] = field(default_factory=list)


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 50,
) -> MSFResult:
    """Unique MSF of the undirected weighted graph (ties broken by
    (weight, src, dst) — callers with possibly-duplicate weights get a
    deterministic, reproducible forest)."""
    e = edges.select(
        "src", "dst", F.col(weight_col).cast("double").alias("w")
    ).localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    picked_parts: list[DataFrame] = []
    counters: list[dict] = []
    total = 0
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        ls = labels.select(F.col("id").alias("src"), F.col("label").alias("lsrc"))
        ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("ldst"))
        live = (
            e.join(ls, "src")
            .join(ld, "dst")
            .where(F.col("lsrc") != F.col("ldst"))
        )
        cand = F.struct("w", "src", "dst", "lsrc", "ldst")
        picks = (
            live.select(F.col("lsrc").alias("comp"), cand.alias("c"))
            .unionByName(live.select(F.col("ldst").alias("comp"), cand.alias("c")))
            .groupBy("comp")
            .agg(F.min("c").alias("c"))
            .select("c.w", "c.src", "c.dst", "c.lsrc", "c.ldst")
            .distinct()  # both endpoints of an edge may pick it
            .localCheckpoint(eager=True)
        )
        n_picked = picks.count()
        counters.append({"round": rounds, "picked": n_picked})
        if n_picked == 0:
            break
        picked_parts.append(picks.select("src", "dst", F.col("w").alias("weight")))
        total += n_picked
        # contract: CC over the picked component-graph edges; canonical
        # (src < dst) orientation for the large-star/small-star kernel
        comp_edges = picks.select(
            F.least("lsrc", "ldst").alias("src"),
            F.greatest("lsrc", "ldst").alias("dst"),
        ).distinct()
        # shrink the live edge set: an edge intra-component under the
        # CURRENT labels can never become inter-component again (labels
        # only merge), so later rounds never re-join it
        e = live.select("src", "dst", "w").localCheckpoint(eager=True)
        merge = connected_components(comp_edges)  # (id=old label, label=new)
        labels = (
            labels.join(
                merge.withColumnRenamed("label", "new_label").withColumnRenamed(
                    "id", "label"
                ),
                "label",
                "left",
            )
            .select(
                "id", F.coalesce("new_label", F.col("label")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
    spark = edges.sparkSession
    if picked_parts:
        forest = picked_parts[0]
        for p in picked_parts[1:]:
            forest = forest.unionByName(p)
    else:
        forest = spark.createDataFrame([], "src long, dst long, weight double")
    return MSFResult(
        forest=forest,
        labels=labels,
        n_edges=total,
        rounds=rounds,
        counters=counters,
    )
