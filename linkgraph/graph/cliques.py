"""Exact 4-clique enumeration on the degree-ordered DAG.

Extends the node-iterator triangle machinery (triangles.py; reference
Triangle.scala:21-38's wedge/close idea one level up): orient every
edge from its lower-(degree, id) endpoint, enumerate DAG triangles
(a, b, c) with a -> b -> c, then extend each by the out-neighbors of
its LAST vertex — in a 4-clique the degree-order-maximal vertex d
receives edges from all three others, so the clique is generated
exactly once: via its unique DAG triangle on the three lowest vertices
and the single candidate edge c -> d.

Scale shape: the candidate stream is Σ_c tri(c) · outdeg(c), and the
degree ordering bounds every out-degree at O(sqrt(2m)) — the same
skew-safety argument as wedge generation, no salting needed. The two
existence checks are semi-joins against the oriented edge table (the
clique's remaining edges a -> d and b -> d are both DAG-oriented), so
nothing wider than the candidate stream ever shuffles, and the edge
side broadcasts below the triangle module's limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph.triangles import (
    _BROADCAST_EDGE_LIMIT,
    _oriented,
    _wedges_join,
)


def four_cliques(edges: DataFrame) -> DataFrame:
    """All 4-cliques of the canonical undirected edge table.

    Returns (a, b, c, d) with a < b < c < d by id, one row per clique,
    exactly.
    """
    oriented = _oriented(edges).localCheckpoint(eager=True)
    n_edges = oriented.count()

    def side(lo_name: str, hi_name: str) -> DataFrame:
        s = oriented.select(
            F.col("lo").alias(lo_name), F.col("hi").alias(hi_name)
        )
        return F.broadcast(s) if n_edges <= _BROADCAST_EDGE_LIMIT else s

    # DAG triangles (a -> b -> c), keeping degree order (the id-sorted
    # public triangles() output would lose which vertex is extendable).
    tri = _wedges_join(oriented, n_edges).join(side("b", "c"), ["b", "c"])
    cand = tri.join(side("c", "d"), "c")  # fan-out <= outdeg(c) = O(sqrt(2m))
    k4 = cand.join(side("a", "d"), ["a", "d"], "left_semi").join(
        side("b", "d"), ["b", "d"], "left_semi"
    )
    ordered = F.array_sort(F.array("a", "b", "c", "d"))
    return k4.select(
        ordered.getItem(0).alias("a"),
        ordered.getItem(1).alias("b"),
        ordered.getItem(2).alias("c"),
        ordered.getItem(3).alias("d"),
    )


def four_clique_count(edges: DataFrame) -> int:
    return four_cliques(edges).count()


def vertex_four_clique_count(k4: DataFrame) -> DataFrame:
    """4-cliques incident to each vertex: (id, n_cliques). Map-side
    combinable explode-aggregate, one row per distinct vertex."""
    vertex = F.explode(F.array("a", "b", "c", "d")).alias("id")
    return (
        k4.select(vertex)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_cliques"))
    )
