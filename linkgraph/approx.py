"""Approximate distinct counts per group (HyperLogLog).

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
