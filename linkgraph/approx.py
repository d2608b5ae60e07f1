"""Approximate distinct counts (HyperLogLog) and quantiles (bounded
equi-width histogram) per group.

Not in the reference; this generalizes the portable HLL sketch built
for hyperball.py (Flajolet et al. 2007, with linear-counting small-
range correction) from per-vertex neighborhood sizes to arbitrary
grouped cardinality — the COUNT(DISTINCT x) GROUP BY k that becomes
infeasible exactly when x has billions of values per key (Spark's own
approx_count_distinct solves this too, but its HLL++ register layout
is engine-internal; this one is the repo's congruence family, so the
driver oracle replays every register and estimate bit-for-bit in
DuckDB — the hyperball determinism contract).

Plan shape: one (group, register)-keyed max aggregate — map-side
combinable, at most m rows per group survive to the shuffle (the hub
dilution argument of hyperball.py: a key with 10^9 distinct values
still contributes m = 2^log2m register rows) — then one per-group
roll-up. Absent registers are handled arithmetically ((m - count)
zero registers), so no dense array is ever materialized.

Accuracy: relative standard error ~= 1.04 / sqrt(m); log2m=6 (m=64)
gives ~13%, log2m=10 ~3%.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkgraph.dedup.phash import poly_hash
from linkgraph.graph.hyperball import _A2, _B2, _SEED_A, _SEED_B, _alpha, _mix, _rho


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    log2m: int = 6,
) -> DataFrame:
    """(group_cols..., n_distinct_est) — HLL estimate per group.

    String value columns are poly-hashed to int64 first (the portable
    code-point hash); numeric columns feed the congruence directly.
    NULL values are ignored (SQL COUNT DISTINCT semantics).
    """
    m = 1 << log2m
    v = F.col(value_col)
    if isinstance(df.schema[value_col].dataType, T.StringType):
        v = poly_hash(v)
    rows = df.where(F.col(value_col).isNotNull()).select(
        *group_cols,
        (_mix(v, _SEED_A, _SEED_B) % F.lit(m)).alias("_reg"),
        _rho(v).alias("_rho"),
    )
    regs = rows.groupBy(*group_cols, "_reg").agg(F.max("_rho").alias("_rho"))
    agg = regs.groupBy(*group_cols).agg(
        (
            F.sum(F.lit(1.0) / F.pow(F.lit(2.0), F.col("_rho").cast("double")))
            + (F.lit(m) - F.count(F.lit(1)))
        ).alias("_inv_sum"),
        (
            (F.lit(m) - F.count(F.lit(1)))
            + F.sum(F.when(F.col("_rho") == 0, 1).otherwise(0))
        ).alias("_zeros"),
    )
    amm = _alpha(m) * m * m
    raw = F.lit(amm) / F.col("_inv_sum")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("_zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("_zeros")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("n_distinct_est"))


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """(group_cols..., q, rank, quantile_est) per requested quantile.

    Histogram-sketch quantiles: exact quantiles need a full sort (or
    Spark's percentile, which collects all values per group); this
    instead keeps <= ``n_buckets`` equi-width counters per group no
    matter the input size, so at 100 TB the shuffle carries counter
    rows, not values. Two bounded aggregates end to end:

      1. per-group (min, max, n) — a few rows, broadcast back;
      2. per-(group, bucket) counts — map-side combinable, <= n_buckets
         survivors per group; the quantile is read off the cumulative
         histogram (window over the bounded counter rows, never over
         data) with linear interpolation inside the hit bucket.

    Error <= one bucket width = (max-min)/n_buckets; exact for integer
    domains narrower than ``n_buckets``. Rank semantics: the estimate
    targets the ceil(q*n)-th smallest value (q=0 clamps to rank 1).
    Every arithmetic step is plain IEEE double algebra, so a SQL oracle
    replays the estimate bit-for-bit.
    """
    gc = list(group_cols or [])
    nb = int(n_buckets)
    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull()).select(*gc, v.alias("_v"))
    bounds = base.groupBy(*gc).agg(
        F.min("_v").alias("_lo"),
        F.max("_v").alias("_hi"),
        F.count(F.lit(1)).alias("_n"),
    )
    joined = (
        base.join(F.broadcast(bounds), on=gc)
        if gc
        else base.crossJoin(F.broadcast(bounds))
    )
    bucket = F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(nb - 1),
            F.floor(
                (F.col("_v") - F.col("_lo"))
                / (F.col("_hi") - F.col("_lo"))
                * F.lit(nb)
            ),
        )
    )
    counts = joined.groupBy(*gc, bucket.alias("_b")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*gc).orderBy("_b")
        if gc
        else Window.partitionBy(F.lit(1)).orderBy("_b")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.withColumn("_cum", F.sum("_cnt").over(w))
    spark = df.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    tagged = (
        cum.join(F.broadcast(bounds), on=gc)
        if gc
        else cum.crossJoin(F.broadcast(bounds))
    ).crossJoin(F.broadcast(qdf))
    r = F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("_n")))
    hit = (
        tagged.withColumn("_r", r)
        .where(F.col("_cum") >= F.col("_r"))
        .groupBy(*gc, "q")
        .agg(
            F.min(F.struct("_b", "_cum", "_cnt", "_lo", "_hi", "_r")).alias("_s")
        )
        .select(*gc, "q", "_s.*")
    )
    est = F.when(F.col("_hi") == F.col("_lo"), F.col("_lo")).otherwise(
        F.col("_lo")
        + (
            F.col("_b")
            + (F.col("_r") - (F.col("_cum") - F.col("_cnt"))) / F.col("_cnt")
        )
        * ((F.col("_hi") - F.col("_lo")) / F.lit(float(nb)))
    )
    return hit.select(
        *gc, "q", F.col("_r").alias("rank"), est.alias("quantile_est")
    )


def quantiles_from_buckets(
    counts: DataFrame,
    lo: float,
    hi: float,
    qs: list[float],
    n_buckets: int,
    bucket_col: str = "bucket",
    count_col: str = "n",
) -> DataFrame:
    """Quantile read-off from a materialized (bucket, count) histogram.

    The streaming companion of ``approx_quantiles``: feed it the
    drained output of ``streaming/textpipe.py::streaming_bucket_counts``
    (whose state store holds <= n_buckets counter rows no matter how
    long the stream runs) and the SAME fixed (lo, hi) bounds, and it
    applies the identical cumulative-histogram + linear-interpolation
    algebra — so running quantiles over an unbounded stream cost
    bounded state plus this read-off over <= n_buckets rows. With
    bounds equal to the data's true min/max it agrees exactly with the
    batch ``approx_quantiles`` (pinned by test_approx parity).
    """
    nb = int(n_buckets)
    c = counts.select(
        F.col(bucket_col).cast("long").alias("_b"),
        F.col(count_col).cast("long").alias("_cnt"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = c.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_n", F.sum("_cnt").over(Window.partitionBy(F.lit(1)))
    )
    qdf = counts.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    tagged = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "_r", F.greatest(F.lit(1).cast("long"), F.ceil(F.col("q") * F.col("_n")))
    )
    hit = (
        tagged.where(F.col("_cum") >= F.col("_r"))
        .groupBy("q")
        .agg(F.min(F.struct("_b", "_cum", "_cnt", "_r")).alias("_s"))
        .select("q", "_s.*")
    )
    if hi == lo:
        est = F.lit(float(lo))
    else:
        est = F.lit(float(lo)) + (
            F.col("_b")
            + (F.col("_r") - (F.col("_cum") - F.col("_cnt"))) / F.col("_cnt")
        ) * F.lit((float(hi) - float(lo)) / nb)
    return hit.select("q", F.col("_r").alias("rank"), est.alias("quantile_est"))
