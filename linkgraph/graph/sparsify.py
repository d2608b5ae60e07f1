"""Similarity-based local graph sparsification.

Not in the reference (scope was triangles/truss/CC) but built ON its
triangle machinery: semantics are the published local sparsification
of Satuluri, Parthasarathy & Ruan ("Local graph sparsification for
scalable clustering", SIGMOD 2011) — rank each vertex's incident
edges by endpoint-neighborhood Jaccard similarity and keep only its
top ceil(deg^e) edges (0 < e <= 1). Clustering structure survives
(intra-cluster edges have high neighborhood overlap) while the edge
count drops superlinearly on hubs — the standard preprocessing step
before community detection on web-scale graphs.

  sim(u, v)  = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|     (edge Jaccard)
  keep (u,v) if rank of sim among u's edges <= ceil(deg(u)^e)
           OR the symmetric condition at v        (union semantics)

Plan shape: common-neighbor counts per EDGE come from the audited
degree-ordered triangle enumeration (triangles.py) + edge_support —
NOT a fresh wedge join; two degree joins give the union size; the
per-vertex rank is one window over the edge list partitioned by
endpoint (each partition is a vertex's incident edges, bounded by max
degree). Ties break deterministically on (similarity DESC, neighbor
ASC). Zero UDFs.

Scale notes: the only superlinear stage is the triangle enumeration
itself, which inherits every scale lever documented in PLANS.md §C
(degree-ordered orientation, gated SHJ wedge join, bloom-filtered
close join). The window sorts each vertex's incident edges — O(deg
log deg) per vertex, hub-bounded, partitioned on the vertex key; no
global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph.edges import canonicalize, degrees
from linkgraph.graph.triangles import edge_support, triangles


def edge_jaccard(edges: DataFrame) -> DataFrame:
    """Per-edge neighborhood Jaccard: (src, dst, common, jaccard).

    Edges with zero common neighbors get jaccard 0 (left join from the
    canonical edge set — every input edge appears in the output).
    """
    e = canonicalize(edges)
    sup = edge_support(triangles(e))
    deg = degrees(e)
    du = deg.select(F.col("id").alias("src"), F.col("degree").alias("_du"))
    dv = deg.select(F.col("id").alias("dst"), F.col("degree").alias("_dv"))
    return (
        e.join(sup, ["src", "dst"], "left_outer")
        .withColumn("common", F.coalesce("support", F.lit(0)))
        .join(du, "src")
        .join(dv, "dst")
        .select(
            "src",
            "dst",
            "common",
            (
                F.col("common")
                / (F.col("_du") + F.col("_dv") - F.col("common"))
            ).alias("jaccard"),
        )
    )


def sparsify(edges: DataFrame, e: float = 0.5) -> DataFrame:
    """Keep each vertex's top ceil(deg^e) edges by Jaccard similarity.

    Union semantics (an edge survives if EITHER endpoint ranks it);
    e=1 keeps everything, smaller e sparsifies harder. Returns the
    surviving canonical edges (src, dst, common, jaccard).
    """
    ec = canonicalize(edges)
    sim = edge_jaccard(ec)
    # Each edge viewed from both endpoints: (id, nbr) + the edge key.
    both = sim.select(
        F.col("src").alias("id"), F.col("dst").alias("nbr"),
        "src", "dst", "common", "jaccard",
    ).unionByName(
        sim.select(
            F.col("dst").alias("id"), F.col("src").alias("nbr"),
            "src", "dst", "common", "jaccard",
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("jaccard"), F.asc("nbr")
    )
    deg = degrees(ec)
    ranked = (
        both.withColumn("_rank", F.row_number().over(w))
        .join(deg, "id")
        .where(F.col("_rank") <= F.ceil(F.pow(F.col("degree"), F.lit(e))))
    )
    return (
        ranked.select("src", "dst", "common", "jaccard")
        .distinct()
    )
