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

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import Checkpointer


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
) -> PageRankResult:
    """PageRank over the canonical edge table.

    ``directed=False`` (default, link-graph mode) treats each undirected
    edge as two directed links. Returns ranks summing to 1.
    """
    spark = edges.sparkSession
    ckpt = checkpointer or Checkpointer(spark, job="pagerank")

    links = edges.select("src", "dst")
    if not directed:
        links = links.unionByName(
            links.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    links = links.localCheckpoint(eager=True)

    vertices = (
        links.select(F.col("src").alias("id"))
        .unionByName(links.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return PageRankResult(
            ranks=spark.createDataFrame([], "id long, rank double"),
            iterations=0,
            delta=0.0,
        )

    out_deg = links.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # (id, rank, out_deg); dangling vertices have out_deg null -> 0.
    state = (
        vertices.join(out_deg, "id", "left_outer")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
        .localCheckpoint(eager=True)
    )

    # Undirected mode has no dangling vertices; skip the per-round scalar
    # aggregate entirely so each superstep is one driver action.
    has_dangling = state.where(F.col("out_deg") == 0).limit(1).count() > 0

    counters: list[dict] = []
    delta = float("inf")
    it = 0
    for it in range(1, max_iter + 1):
        dangling = (
            state.where(F.col("out_deg") == 0)
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
            if has_dangling
            else 0.0
        )
        contribs = (
            links.join(state, links["src"] == state["id"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_state = (
            state.join(contribs, state["id"] == contribs["dst"], "left_outer")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias(
                    "new_rank"
                ),
                "rank",
                "out_deg",
            )
        )
        # One action: convergence delta; checkpoint cuts per-round lineage.
        new_state = ckpt.save(
            new_state.select(
                "id",
                F.col("new_rank").alias("rank"),
                (F.col("new_rank") - F.col("rank")).alias("d"),
                "out_deg",
            ),
            it,
        )
        delta = new_state.agg(F.max(F.abs("d"))).collect()[0][0]
        state = new_state.select("id", "rank", "out_deg")
        counters.append({"iteration": it, "max_delta": delta})
        if delta < tol:
            break
    return PageRankResult(
        ranks=state.select("id", "rank"), iterations=it, delta=delta, counters=counters
    )
