"""Reference-parity text output formats.

The reference writes plain-text result files (README.md "Output"):
- truss/maxtruss: one line per surviving edge,
  ``trussId v1 deg1 v2 deg2`` (spark Truss.scala:12-14 toString), with
  the edge degree-order oriented (lower-(degree,id) endpoint first,
  createEdge Truss.scala:236-243);
- triangle: one line per triangle, three such edges = 12 ints
  (README.md:87-98).

These helpers reproduce that orientation and layout so a reference
user's downstream tooling reads our output unchanged. Degrees are the
input graph's degrees (computed once up front, exactly like
addDegreesToGraph — never refreshed during peeling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph.edges import degrees as _degrees


def _with_oriented_degrees(df: DataFrame, deg: DataFrame) -> DataFrame:
    """Attach src/dst degrees and re-orient lower-(degree, id) first."""
    out = (
        df.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("sd")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("dd")), "dst")
    )
    lo_first = F.struct("sd", "src") < F.struct("dd", "dst")
    return out.select(
        *[c for c in df.columns if c not in ("src", "dst")],
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("v1"),
        F.when(lo_first, F.col("sd")).otherwise(F.col("dd")).alias("d1"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("v2"),
        F.when(lo_first, F.col("dd")).otherwise(F.col("sd")).alias("d2"),
    )


def truss_text(component_edges: DataFrame, graph: DataFrame) -> DataFrame:
    """(value: string) — ``trussId v1 deg1 v2 deg2`` per surviving edge.

    ``component_edges`` is the (component, src, dst) output of
    k_truss_components; ``graph`` is the ORIGINAL canonical edge table
    (degree source).
    """
    deg = _degrees(graph)
    oriented = _with_oriented_degrees(component_edges, deg)
    return oriented.select(
        F.concat_ws(
            " ", "component", "v1", "d1", "v2", "d2"
        ).alias("value")
    )


def triangle_text(tri: DataFrame, graph: DataFrame) -> DataFrame:
    """(value: string) — 12 ints per triangle: edges (a,b) (a,c) (b,c),
    each as ``v1 deg1 v2 deg2`` in degree orientation."""
    deg = _degrees(graph)

    def edge(u: str, v: str, tag: str) -> DataFrame:
        return _with_oriented_degrees(
            tri.select(F.col(u).alias("src"), F.col(v).alias("dst"), "a", "b", "c"),
            deg,
        ).select(
            "a", "b", "c",
            F.concat_ws(" ", "v1", "d1", "v2", "d2").alias(tag),
        )

    e1 = edge("a", "b", "e1")
    e2 = edge("a", "c", "e2")
    e3 = edge("b", "c", "e3")
    return (
        e1.join(e2, ["a", "b", "c"])
        .join(e3, ["a", "b", "c"])
        .select(F.concat_ws(" ", "e1", "e2", "e3").alias("value"))
    )
