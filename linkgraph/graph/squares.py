"""Exact 4-cycle (square) counting from wedge-endpoint aggregation.

Not in the reference (scope was triangles/truss/CC); squares are the
bipartite-ish analogue of triangles for link graphs — co-citation /
co-import patterns show up as C4s even when triangles are rare (e.g.
two repos importing the same two modules). Identity: every 4-cycle
u-a-v-b has exactly two diagonals {u,v} and {a,b}; a diagonal pair
with cn common neighbors closes C(cn, 2) squares, so

  n_squares = (1/2) * sum over unordered pairs {u,v} of C(cn_uv, 2).

Plan shape: one wedge self-join of the bidirected adjacency on the
center (same stream as link prediction), one hash aggregate per
unordered endpoint pair, one global sum. All JVM-side.

Scale notes: the wedge stream is O(sum deg^2) and intrinsic to exact
common-neighbor counting; as in linkpred.py, `max_center_degree`
drops mega-hub centers BEFORE the self-join for the approximate
regime (a hub of degree d contributes O(d^2) wedges but its squares
are the least informative). The pair aggregate is map-side combinable
(counts), so the shuffle carries distinct pairs, not raw wedges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def diagonal_pairs(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """(u, v, common_neighbors) for every unordered pair with cn >= 2
    (pairs with fewer close no squares). Exact when the hub cap is None.
    """
    e = edges.select("src", "dst")
    b = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    adj = b
    if max_center_degree is not None:
        deg = b.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        adj = (
            b.join(deg.where(F.col("degree") <= max_center_degree),
                   b["src"] == F.col("id"))
            .select("src", "dst")
        )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    wedges = (
        a1.join(a2, F.col("a1.src") == F.col("a2.src"))
        .where(F.col("a1.dst") < F.col("a2.dst"))
        .select(F.col("a1.dst").alias("u"), F.col("a2.dst").alias("v"))
    )
    return (
        wedges.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .where(F.col("common_neighbors") >= 2)
    )


def square_count(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Total number of 4-cycles, as a 1-row (n_squares) frame."""
    pairs = diagonal_pairs(edges, max_center_degree=max_center_degree)
    cn = F.col("common_neighbors")
    # sum(cn*(cn-1)) is divisible by 4 (2 per C(cn,2), 2 diagonals per
    # square), so the integer sum keeps the count exact at any scale.
    return pairs.agg(
        F.coalesce((F.sum(cn * (cn - 1)) / 4).cast("long"), F.lit(0).cast("long"))
        .alias("n_squares")
    )
