"""Distribution drift between two corpus slices: PSI and KL.

Not in the reference (no text layer); semantics are the standard
population-stability-index monitoring used on production data
pipelines: bucket a numeric feature on the REFERENCE slice's range,
compare the two slices' bucket mass, and report

  psi_term_i = (p_i - q_i) * ln(p_i / q_i)          (PSI = sum)
  kl_term_i  = p_i * ln(p_i / q_i)                  (KL(ref||cur))

with epsilon-smoothed proportions (all-mass-preserving: eps is added
per bucket and the denominator grows by n_buckets * eps, so terms stay
exactly reproducible). Common thresholds: PSI < 0.1 stable, 0.1-0.25
drifting, > 0.25 shifted.

Bucketing is equal-width over the reference slice's [min, max] — two
1-row aggregates broadcast back — NOT quantile-based, so the bucket
function is closed-form arithmetic and the DuckDB oracle replays it
exactly (quantile edges would depend on the engine's interpolation).

Plan shape: one min/max aggregate on ref (1 row, broadcast), one
bucket-count aggregate per slice (map-side combinable, n_buckets
reduce rows each), one n_buckets-row join. Nothing corpus-sized
shuffles; a 100 TB slice streams through the scan + partial aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPS = 1e-6


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-bucket drift terms between two slices of a numeric column.

    Returns (bucket, n_ref, n_cur, p_ref, p_cur, psi_term, kl_term)
    with `bucket` in [0, n_buckets); sum(psi_term) is the PSI,
    sum(kl_term) the KL divergence. Rows below/above the reference
    range clamp into the edge buckets. NULLs are dropped.
    """
    r = ref.select(F.col(col).cast("double").alias("x")).where(
        F.col("x").isNotNull()
    )
    c = cur.select(F.col(col).cast("double").alias("x")).where(
        F.col("x").isNotNull()
    )
    bounds = r.agg(
        F.min("x").alias("_lo"), F.max("x").alias("_hi")
    )

    def bucketed(df: DataFrame, cnt: str) -> DataFrame:
        b = F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col("x") - F.col("_lo"))
                        / (F.col("_hi") - F.col("_lo"))
                        * n_buckets
                    ).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0))
        return (
            df.crossJoin(F.broadcast(bounds))
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(cnt))
        )

    spark = ref.sparkSession
    all_buckets = spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket")
    )
    joined = (
        all_buckets.join(bucketed(r, "n_ref"), "bucket", "left_outer")
        .join(bucketed(c, "n_cur"), "bucket", "left_outer")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cur").alias("_tc")
    )
    p = (F.col("n_ref") + F.lit(_EPS)) / (
        F.col("_tr") + F.lit(n_buckets * _EPS)
    )
    q = (F.col("n_cur") + F.lit(_EPS)) / (
        F.col("_tc") + F.lit(n_buckets * _EPS)
    )
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            p.alias("p_ref"),
            q.alias("p_cur"),
            ((p - q) * F.log(p / q)).alias("psi_term"),
            (p * F.log(p / q)).alias("kl_term"),
        )
    )


def drift_summary(
    ref: DataFrame, cur: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """One row: (psi, kl) for a quick stability verdict."""
    return distribution_drift(ref, cur, col, n_buckets).agg(
        F.sum("psi_term").alias("psi"), F.sum("kl_term").alias("kl")
    )
