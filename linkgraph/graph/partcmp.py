"""Partition comparison: Adjusted Rand Index and Normalized Mutual
Information between two vertex labelings.

The evaluation primitive for the engine's community detectors (LPA,
Louvain, connected components, k-truss communities): given two
labelings of the same vertex set, how similar are the partitions?
Standard pair-counting ARI (Hubert & Arabie 1985) and NMI with sqrt
normalization (Strehl & Ghosh 2002).

Exactness contract: every count (contingency cells, marginals, pair
sums x·(x-1)) is exact int64; the final ARI/NMI are double expressions
over those integers, identical across engines up to summation order of
the MI/entropy terms (absorbed by round(6) in the driver row).
Conventions for degenerate inputs: ARI = 1.0 when the adjusted
denominator is 0 (both partitions trivial in the same way); NMI = 1.0
when both entropies are 0, 0.0 when exactly one is.

Plan shape: one co-keyed join of the two label tables on id, one
contingency aggregate (map-side combinable — the shuffle carries at
most |labels_a|·|labels_b| cells, in practice ~max(#clusters) rows),
two marginal aggregates over the CELLS (never re-touching the vertex
table), and 1-row reductions. No windows, no Python, no driver loop;
at 1e9 vertices the only O(V) stage is the initial join, which
co-partitions on id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def contingency_table(
    a: DataFrame, b: DataFrame, id_col: str = "id", label_col: str = "label"
) -> DataFrame:
    """(label_a, label_b, n) over the common ids of two labelings."""
    la = a.select(F.col(id_col).alias("id"), F.col(label_col).alias("label_a"))
    lb = b.select(F.col(id_col).alias("id"), F.col(label_col).alias("label_b"))
    return (
        la.join(lb, "id")
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def partition_agreement(
    a: DataFrame, b: DataFrame, id_col: str = "id", label_col: str = "label"
) -> DataFrame:
    """One row: (n, ari, nmi) for the two labelings' common ids."""
    # One materialization: the cell table is bounded (≤ #clusters_a ×
    # #clusters_b rows) and feeds SIX downstream aggregates — without
    # the checkpoint each 1-row branch would recompute the O(V) id join.
    cell = contingency_table(
        a, b, id_col=id_col, label_col=label_col
    ).localCheckpoint(eager=True)
    ma = cell.groupBy("label_a").agg(F.sum("n").alias("ai"))
    mb = cell.groupBy("label_b").agg(F.sum("n").alias("bj"))

    tot = cell.agg(
        F.sum("n").alias("n"),
        F.sum(F.col("n") * (F.col("n") - 1)).alias("sij2"),
    )
    sa = ma.agg(F.sum(F.col("ai") * (F.col("ai") - 1)).alias("sa2"))
    sb = mb.agg(F.sum(F.col("bj") * (F.col("bj") - 1)).alias("sb2"))

    # MI/entropies: each term from exact integer counts; ln in double.
    nn = F.col("n_total").cast("double")
    mi = (
        cell.join(ma, "label_a")
        .join(mb, "label_b")
        .crossJoin(F.broadcast(tot.select(F.col("n").alias("n_total"))))
        .agg(
            F.sum(
                (F.col("n") / nn)
                * F.log(nn * F.col("n") / (F.col("ai") * F.col("bj")))
            ).alias("mi")
        )
    )
    ha = (
        ma.crossJoin(F.broadcast(tot.select(F.col("n").alias("n_total"))))
        .agg((-F.sum((F.col("ai") / nn) * F.log(F.col("ai") / nn))).alias("ha"))
    )
    hb = (
        mb.crossJoin(F.broadcast(tot.select(F.col("n").alias("n_total"))))
        .agg((-F.sum((F.col("bj") / nn) * F.log(F.col("bj") / nn))).alias("hb"))
    )

    one = (
        tot.crossJoin(sa).crossJoin(sb).crossJoin(mi).crossJoin(ha).crossJoin(hb)
    )
    t_pairs = F.col("n").cast("double") * (F.col("n") - 1) / F.lit(2.0)
    sij = F.col("sij2").cast("double") / 2.0
    sac = F.col("sa2").cast("double") / 2.0
    sbc = F.col("sb2").cast("double") / 2.0
    expected = sac * sbc / t_pairs
    denom = (sac + sbc) / 2.0 - expected
    ari = (
        F.when(t_pairs == 0.0, F.lit(1.0))  # n <= 1: trivially identical
        .when(denom == 0.0, F.lit(1.0))
        .otherwise((sij - expected) / denom)
    )
    nmi = (
        F.when((F.col("ha") == 0.0) & (F.col("hb") == 0.0), F.lit(1.0))
        .when((F.col("ha") == 0.0) | (F.col("hb") == 0.0), F.lit(0.0))
        .otherwise(F.col("mi") / F.sqrt(F.col("ha") * F.col("hb")))
    )
    return one.select("n", ari.alias("ari"), nmi.alias("nmi"))
