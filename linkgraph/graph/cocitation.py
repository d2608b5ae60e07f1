"""Co-citation and bibliographic coupling over a directed link graph.

Not in the reference (scope was triangles/truss/CC; the directed
analytics quartet there is degrees/bidirect — ``Graph.scala:24-60``);
semantics are the published measures:

  co-citation (Small, JASIS 1973):
    cocite(a, b)  = |{u : u->a AND u->b}|      (cited together)
  bibliographic coupling (Kessler, American Documentation 1963):
    couple(a, b)  = |{v : a->v AND b->v}|      (cite the same things)

plus the cosine normalizations used in citation analysis:
    cocite_cos(a,b) = cocite(a,b) / sqrt(indeg(a) * indeg(b))
    couple_cos(a,b) = couple(a,b) / sqrt(outdeg(a) * outdeg(b))

These are the first-order, fixed-cost core of SimRank: SimRank's
recursion seeds from exactly these overlap counts, but its O(n^2)
all-pairs state cannot shuffle at web scale, while a single wedge
aggregate can.

Plan shape (mirrors linkpred.py): ONE self-join of the directed edge
table on the shared endpoint (src for co-citation, dst for coupling),
ONE hash aggregate per unordered pair (map-side combinable count),
then two degree joins for the cosine — all JVM-side codegen, zero
UDFs.

Scale notes: the wedge stream is O(sum outdeg^2) (co-citation) /
O(sum indeg^2) (coupling) and is intrinsic to the exact counts.  The
standard web-scale mitigation is the same hub cap as linkpred.py: a
source citing 10^5 pages contributes 10^10 candidate pairs and
near-zero signal per pair, so `max_center_degree` filters such
centers BEFORE the quadratic self-join (a plain pushed-down filter on
the degreed edge table); `min_count` prunes the 1-overlap long tail
inside the aggregate (HAVING) before the degree joins see it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pair_overlap(
    edges: DataFrame,
    center: str,
    endpoint: str,
    min_count: int,
    max_center_degree: int | None,
    count_col: str,
) -> DataFrame:
    """Count, per unordered endpoint pair, the centers linking both.

    center/endpoint name the edge columns: co-citation groups wedges
    by shared src, coupling by shared dst.
    """
    adj = edges.select("src", "dst").distinct()
    if max_center_degree is not None:
        # Pushed-down filter ahead of the quadratic self-join; the
        # degree join only exists when a cap is requested.
        cdeg = adj.groupBy(center).agg(F.count(F.lit(1)).alias("_cdeg"))
        adj = adj.join(cdeg, center).where(
            F.col("_cdeg") <= max_center_degree
        )
    a1, a2 = adj.alias("a1"), adj.alias("a2")
    return (
        a1.join(a2, F.col(f"a1.{center}") == F.col(f"a2.{center}"))
        .where(F.col(f"a1.{endpoint}") < F.col(f"a2.{endpoint}"))
        .groupBy(
            F.col(f"a1.{endpoint}").alias("a"),
            F.col(f"a2.{endpoint}").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias(count_col))
        .where(F.col(count_col) >= min_count)
    )


def co_citation(
    edges: DataFrame,
    min_count: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Pairs cited by a shared source: (a, b, cocitations, cosine).

    a < b; cosine = cocitations / sqrt(indeg(a)*indeg(b)) over the
    deduplicated edge set. Exact when `max_center_degree` is None.
    """
    e = edges.select("src", "dst").distinct()
    pairs = _pair_overlap(
        edges, "src", "dst", min_count, max_center_degree, "cocitations"
    )
    indeg = e.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    da = indeg.select(F.col("id").alias("a"), F.col("indeg").alias("_da"))
    db = indeg.select(F.col("id").alias("b"), F.col("indeg").alias("_db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "cocitations",
            (F.col("cocitations") / F.sqrt(F.col("_da") * F.col("_db"))).alias(
                "cosine"
            ),
        )
    )


def bibliographic_coupling(
    edges: DataFrame,
    min_count: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Pairs citing a shared target: (a, b, couplings, cosine).

    a < b; cosine = couplings / sqrt(outdeg(a)*outdeg(b)) over the
    deduplicated edge set. Exact when `max_center_degree` is None.
    """
    e = edges.select("src", "dst").distinct()
    pairs = _pair_overlap(
        edges, "dst", "src", min_count, max_center_degree, "couplings"
    )
    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    da = outdeg.select(F.col("id").alias("a"), F.col("outdeg").alias("_da"))
    db = outdeg.select(F.col("id").alias("b"), F.col("outdeg").alias("_db"))
    return (
        pairs.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "couplings",
            (F.col("couplings") / F.sqrt(F.col("_da") * F.col("_db"))).alias(
                "cosine"
            ),
        )
    )
