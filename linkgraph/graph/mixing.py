"""Attribute mixing matrix + Newman attribute assortativity.

Not in the reference (no vertex attributes there); this is the
standard categorical-homophily diagnostic for an attributed link graph
(Newman, "Mixing patterns in networks", PRE 67, 2003, eq. 2): how
often edges connect same-attribute endpoints vs what the marginal
attribute frequencies would predict.

  e_ij = fraction of directed edge-ends (u -> v) with attr(u)=i,
         attr(v)=j (each undirected edge counted in both directions,
         so e is symmetric); a_i / b_j its marginals.
  r = (sum_i e_ii - sum_i a_i * b_i) / (1 - sum_i a_i * b_i)

Plan shape: two equi-joins of the (bidirected) edge list against the
attribute table on the endpoint id — both co-keyed with the edge
partitioning — then ONE map-side-combinable (attr_a, attr_b) count.
Everything after the matrix aggregate runs on <= k^2 rows (k =
attribute cardinality): marginals, trace, and the scalar r are
bounded-row algebra, so at 100 TB the cost is the one edge-attribute
join pass. Endpoints missing from the attribute table drop out (inner
join) — their edges contribute to neither numerator nor marginals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixing_matrix(
    edges: DataFrame,
    attrs: DataFrame,
    id_col: str = "id",
    attr_col: str = "attr",
) -> DataFrame:
    """(attr_a, attr_b, n_ends, frac) — symmetric directed-ends counts.

    ``n_ends`` sums to 2 * |labeled edges| across the matrix.
    """
    b = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    a1 = attrs.select(F.col(id_col).alias("_i1"), F.col(attr_col).alias("attr_a"))
    a2 = attrs.select(F.col(id_col).alias("_i2"), F.col(attr_col).alias("attr_b"))
    m = (
        b.join(a1, b["src"] == a1["_i1"])
        .join(a2, b["dst"] == a2["_i2"])
        .groupBy("attr_a", "attr_b")
        .agg(F.count(F.lit(1)).alias("n_ends"))
        # <= k^2 rows, but its lineage is the corpus-sized join — cut it
        # so the matrix, its total, the marginals, and the trace all
        # read one materialization instead of re-running the join.
        .localCheckpoint(eager=True)
    )
    total = m.agg(F.sum("n_ends").alias("_tot"))
    return m.crossJoin(F.broadcast(total)).select(
        "attr_a",
        "attr_b",
        "n_ends",
        (F.col("n_ends") / F.col("_tot")).alias("frac"),
    )


def attribute_assortativity(
    edges: DataFrame,
    attrs: DataFrame,
    id_col: str = "id",
    attr_col: str = "attr",
) -> DataFrame:
    """One row: (r, trace, chance) — Newman attribute assortativity.

    trace = sum_i e_ii, chance = sum_i a_i * b_i; r = (trace - chance)
    / (1 - chance), NULL when every labeled endpoint shares one
    attribute (chance = 1, r undefined).
    """
    m = mixing_matrix(edges, attrs, id_col, attr_col)
    row = m.groupBy("attr_a").agg(F.sum("frac").alias("a_i"))
    col = m.groupBy("attr_b").agg(F.sum("frac").alias("b_i"))
    chance = (
        row.join(col, row["attr_a"] == col["attr_b"])
        .agg(F.sum(F.col("a_i") * F.col("b_i")).alias("chance"))
    )
    trace = m.where(F.col("attr_a") == F.col("attr_b")).agg(
        F.coalesce(F.sum("frac"), F.lit(0.0)).alias("trace")
    )
    return trace.crossJoin(F.broadcast(chance)).select(
        F.when(
            F.col("chance") < 1.0,
            (F.col("trace") - F.col("chance")) / (F.lit(1.0) - F.col("chance")),
        ).alias("r"),
        "trace",
        "chance",
    )
