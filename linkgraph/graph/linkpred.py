"""Neighborhood-overlap link prediction: common neighbors, Jaccard,
Adamic-Adar.

Not in the reference (scope was triangles/truss/CC); semantics are the
published measures (Liben-Nowell & Kleinberg, "The link prediction
problem for social networks", CIKM 2003; Adamic & Adar, "Friends and
neighbors on the web", Social Networks 2003) over the canonical
undirected edge table (src < dst):

  for each NON-ADJACENT pair (u, v) with >= 1 common neighbor w:
    common_neighbors = |N(u) ∩ N(v)|
    jaccard          = cn / (deg(u) + deg(v) - cn)
    adamic_adar      = sum over common w of 1 / ln(deg(w))

Plan shape: one wedge self-join of the bidirected adjacency on the
center (the SAME O(sum deg^2) wedge stream triangles.py enumerates),
one hash aggregate per unordered pair (count + AA sum in one agg),
one anti-join against the edge set, two degree joins. All JVM-side.

Scale notes: the wedge stream is intrinsic to exact common-neighbor
counting — unlike triangle counting, degree-ordering can't shrink it
(every wedge contributes to some pair's score). At web scale the
standard mitigation is excluding mega-hub centers, which contribute
O(deg^2) candidate pairs each while adding ~1/ln(deg) ~ 0 signal per
pair: `max_center_degree` drops centers above the cap BEFORE the
self-join (a plain pushed-down filter on the degreed adjacency).
`min_common` prunes the long tail of 1-common-neighbor pairs in the
aggregate HAVING clause, bounding output cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_prediction(
    edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Score non-adjacent vertex pairs by neighborhood overlap.

    Returns (u, v, common_neighbors, jaccard, adamic_adar) with u < v,
    only pairs with at least `min_common` common neighbors. Exact when
    `max_center_degree` is None (the driver-oracle configuration).
    """
    e = edges.select("src", "dst")
    b = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = b.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )

    # Degreed adjacency, center = src. The hub cap is a pushed-down
    # filter here, before the quadratic self-join.
    adj = b.join(deg, b["src"] == deg["id"]).select(
        "src", "dst", F.col("degree").alias("center_deg")
    )
    if max_center_degree is not None:
        adj = adj.where(F.col("center_deg") <= max_center_degree)

    a1, a2 = adj.alias("a1"), adj.alias("a2")
    wedges = (
        a1.join(a2, (F.col("a1.src") == F.col("a2.src")))
        .where(F.col("a1.dst") < F.col("a2.dst"))
        .select(
            F.col("a1.dst").alias("u"),
            F.col("a2.dst").alias("v"),
            F.col("a1.center_deg").alias("w_deg"),
        )
    )
    scored = (
        wedges.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log("w_deg")).alias("adamic_adar"),
        )
        .where(F.col("common_neighbors") >= min_common)
    )
    # Keep only non-adjacent pairs (u < v matches the canonical edge
    # orientation, so one anti-join suffices).
    candidates = scored.join(
        e,
        (scored["u"] == e["src"]) & (scored["v"] == e["dst"]),
        "left_anti",
    )

    du = deg.select(F.col("id").alias("u"), F.col("degree").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("degree").alias("deg_v"))
    return (
        candidates.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
