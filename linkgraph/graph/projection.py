"""Weighted bipartite projection + item-item similarity.

The general form of the co-purchase derivation (datasets.py /
reference convertGraph): project a (basket, item) membership relation
onto items, carrying the co-occurrence count per pair, then attach the
association measures recommendation / association-mining pipelines
score with (Jaccard, cosine, lift).

Scale shape: the pair generator is a self-join keyed on the basket id,
so each basket contributes C(k, 2) rows — the classic quadratic basket
blowup. ``max_basket_size`` caps it exactly like ngram.py's
document-frequency cap: degenerate baskets (a mega-order, a viral
session) are dropped BEFORE the self-join with one aggregate + semi
join, and the cap is part of the operator's contract so the oracle can
replicate it. Pair counts aggregate with map-side combine; the two
degree joins are keyed on one endpoint each (broadcastable when the
item vocabulary is small, co-partitioned otherwise); N (distinct
baskets) is a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _memberships(
    df: DataFrame, basket_col: str, item_col: str, max_basket_size: int | None
) -> DataFrame:
    m = df.select(basket_col, item_col).distinct()
    if max_basket_size is not None:
        ok = (
            m.groupBy(basket_col)
            .agg(F.count(F.lit(1)).alias("_sz"))
            .where(F.col("_sz") <= max_basket_size)
            .select(basket_col)
        )
        m = m.join(ok, basket_col, "left_semi")
    return m


def _pairs(m: DataFrame, basket_col: str, item_col: str) -> DataFrame:
    x, y = m.alias("x"), m.alias("y")
    return (
        x.join(y, basket_col)
        .where(F.col(f"x.{item_col}") < F.col(f"y.{item_col}"))
        .groupBy(
            F.col(f"x.{item_col}").alias("src"),
            F.col(f"y.{item_col}").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def weighted_projection(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """(src, dst, n_common): undirected item pairs (src < dst) with the
    number of baskets containing both.

    The distinct membership set is materialized once (triangles.py's
    one-materialization discipline) — both self-join aliases read the
    checkpoint instead of re-running the scan + distinct aggregate.
    """
    m = _memberships(df, basket_col, item_col, max_basket_size)
    return _pairs(m.localCheckpoint(eager=True), basket_col, item_col)


def cooccurrence_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Item-item association scores over the weighted projection.

    (src, dst, n_common, jaccard, cosine, lift) with src < dst:
    jaccard = c / (d_a + d_b - c), cosine = c / sqrt(d_a · d_b),
    lift = c · N / (d_a · d_b), where d_* are per-item basket counts
    and N is the number of distinct (capped) baskets.
    """
    # One materialization feeds all four consumers (pair self-join ×2,
    # degrees, basket count) — without it the scan + distinct aggregate
    # runs four times (observed in the sf0.01 plan audit).
    m = _memberships(df, basket_col, item_col, max_basket_size).localCheckpoint(
        eager=True
    )
    pairs = _pairs(m, basket_col, item_col)
    if min_common > 1:
        pairs = pairs.where(F.col("n_common") >= min_common)
    deg = m.groupBy(item_col).agg(F.count(F.lit(1)).alias("d"))
    n_baskets = m.select(basket_col).distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    da = deg.select(F.col(item_col).alias("src"), F.col("d").alias("d_a"))
    db = deg.select(F.col(item_col).alias("dst"), F.col("d").alias("d_b"))
    c = F.col("n_common").cast("double")
    return (
        pairs.join(da, "src")
        .join(db, "dst")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "src",
            "dst",
            "n_common",
            (c / (F.col("d_a") + F.col("d_b") - F.col("n_common"))).alias(
                "jaccard"
            ),
            (c / F.sqrt(F.col("d_a") * F.col("d_b"))).alias("cosine"),
            (c * F.col("n_baskets") / (F.col("d_a") * F.col("d_b"))).alias(
                "lift"
            ),
        )
    )


def butterfly_count(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """One row (n_butterflies): bipartite 4-cycles (2 baskets × 2
    items, the bipartite clique K2,2) = Σ over item pairs of
    C(n_common, 2) — a single integer aggregate over the weighted
    projection (the pair-wedge identity; same shape as squares.py's
    diagonal-pair trick). All-int64, no doubles.
    """
    c = F.col("n_common")
    return weighted_projection(df, basket_col, item_col, max_basket_size).agg(
        F.coalesce(F.sum((c * (c - F.lit(1))).cast("long")), F.lit(0))
        .cast("long").alias("n_butterflies2")
    ).select(F.expr("n_butterflies2 div 2").alias("n_butterflies"))
