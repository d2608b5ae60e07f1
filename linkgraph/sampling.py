"""Deterministic hash-based sampling for training-data pipelines.

A 100 TB corpus is sampled by KEY, not by ``rand()``: the same key must
land in the same split on every run, on every executor count, and
after any repartition — otherwise train/eval splits drift between
pipeline runs and ablations stop being comparable. The standard
construction: hash the key with a salt, take rows whose hash bucket
falls below ``fraction`` of the bucket space.

Two hash families (same pattern as dedup/minhash):
- default ``xxhash64`` — JVM intrinsic, the scale path;
- ``portable=True`` — the cross-engine polynomial hash
  (dedup/phash.poly_hash), bit-identical in DuckDB, used by the
  driver-oracle query. Slower (per-character fold), oracle paths only.

Everything is a single pushed-down filter (plus one small aggregate
for the stratified variant): no shuffle, no sort, no driver data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.dedup.phash import P1, poly_hash

_BUCKETS = 1_000_000
# Post-mix constants for the portable path (see _bucket).
MIX_C1 = 0x9E3779B9
MIX_C2 = 0x85EBCA6B


def _bucket(key: Column, salt: str, portable: bool) -> Column:
    """Uniform bucket in [0, _BUCKETS) from (key, salt).

    The portable polynomial hash is LINEAR in the trailing characters:
    short keys ("123:0") never wrap the modulus, so nearby keys land in
    one narrow band of bucket space — useless as a sampler. Two rounds
    of square-and-add mod P1 give avalanche (measured: 25.00% of 100k
    integer keys below a 25% cut, deciles uniform) while staying exact
    int64 arithmetic both engines evaluate identically
    (h^2 < (P1)^2 ~ 1.0e18 < int64 max; ANSI-mode safe)."""
    tagged = F.concat(key.cast("string"), F.lit(":" + salt))
    if portable:
        h = poly_hash(tagged)  # [0, P1), linear in the key tail
        h = F.pmod(h * h + F.lit(MIX_C1), F.lit(P1))
        h = F.pmod(h * h + F.lit(MIX_C2), F.lit(P1))
    else:
        h = F.pmod(F.xxhash64(tagged), F.lit(P1))  # already avalanched
    return F.pmod(h, F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "0",
    portable: bool = False,
) -> DataFrame:
    """Keep rows whose hashed key falls in the first `fraction` of
    bucket space. Deterministic in the key: duplicate keys are kept or
    dropped together (sampling by DOCUMENT, not by row)."""
    cut = int(round(fraction * _BUCKETS))
    return df.where(_bucket(F.col(key_col), salt, portable) < cut)


def train_eval_split(
    df: DataFrame,
    key_col: str,
    eval_fraction: float = 0.01,
    salt: str = "split",
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, eval) split by hashed key — the two
    predicates are complements of one filter, so both sides prune at
    the scan and no key can end up in both."""
    cut = int(round(eval_fraction * _BUCKETS))
    b = _bucket(F.col(key_col), salt, portable)
    return df.where(b >= cut), df.where(b < cut)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "0",
    portable: bool = False,
) -> DataFrame:
    """Per-stratum hash sampling: stratum s keeps `fractions[s]` of its
    keys (strata absent from the dict keep `default_fraction`).

    The per-stratum cut compiles to one CASE expression — still a
    single pushed-down filter, no join; the strata dict is a bounded
    driver-side literal (language/domain lists, not data)."""
    cut = F.lit(int(round(default_fraction * _BUCKETS)))
    for s, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == s, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(cut)
    return df.where(_bucket(F.col(key_col), salt, portable) < cut)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    scale: float = 1.0,
    salt: str = "w",
    portable: bool = False,
) -> DataFrame:
    """Keep each key with probability ``min(1, scale * weight)`` —
    deterministic importance sampling (quality-weighted data mixing:
    up-weight high-quality documents by keeping them with higher
    probability, reproducibly).

    Same single pushed-down filter as `hash_sample`: the per-row cut is
    ``scale * weight * _BUCKETS`` instead of a constant, so the keep
    decision is still a pure function of (key, salt, weight) — stable
    across runs, executor counts, and repartitions. Weights > 1/scale
    are always kept (cut saturates at the bucket space).
    """
    cut = F.least(
        F.lit(float(_BUCKETS)),
        F.col(weight_col).cast("double") * F.lit(scale * _BUCKETS),
    )
    return df.where(
        _bucket(F.col(key_col), salt, portable).cast("double") < cut
    )


def mixing_rates(
    df: DataFrame, group_col: str, alpha: float = 0.5
) -> DataFrame:
    """(group, n, rate): per-group keep rates for temperature mixing.

    Temperature-scaled data mixing (the multilingual-LM convention —
    Conneau & Lample 2019, mT5): sample groups proportionally to
    p_g^alpha instead of their natural share p_g, damping dominant
    domains/languages. Realized as a per-row KEEP probability
    ``rate_g = (n_g / n_min)^(alpha-1)`` — the smallest group is kept
    in full (rate 1) and larger groups are downsampled so expected
    group sizes are proportional to n_g^alpha; a filter cannot
    upsample, so this is the keep-the-smallest-intact normalization.
    ``alpha = 1`` keeps everything; ``alpha = 0`` equalizes expected
    group sizes. Plan: one map-side-combinable count aggregate plus a
    1-row min — the corpus itself is not touched.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    nmin = counts.agg(F.min("n").alias("n_min"))
    return counts.crossJoin(F.broadcast(nmin)).select(
        group_col,
        "n",
        F.pow(F.col("n").cast("double") / F.col("n_min"), F.lit(alpha - 1.0))
        .alias("rate"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "mix",
    portable: bool = False,
) -> DataFrame:
    """The temperature-mixed corpus: deterministic per-key keep with
    the group's :func:`mixing_rates` rate — same avalanche-bucket
    filter as `hash_sample`, with the cut looked up via one broadcast
    join on the (bounded) group-rate table. All input columns kept.
    """
    rates = mixing_rates(df, group_col, alpha=alpha).select(
        group_col, (F.col("rate") * _BUCKETS).alias("_cut")
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .where(_bucket(F.col(key_col), salt, portable).cast("double")
               < F.col("_cut"))
        .drop("_cut")
    )


def budget_select(
    df: DataFrame,
    group_col: str,
    cost_col: str,
    score_col: str,
    budget: int | float,
    id_col: str = "doc_id",
    keep_cum: bool = False,
) -> DataFrame:
    """Best-first selection under a per-group cost budget: within each
    group, rows are taken in (score desc, id asc) order while the
    running cost INCLUDING the current row stays <= ``budget`` (the
    pretraining-curation shape: best documents per domain up to a token
    budget).

    One window partitioned by the group key — no global sort; a group
    is a single window partition, so the operator assumes group
    cardinality >> partition skew (cap pathological groups upstream,
    e.g. with temperature_mix). A row larger than the whole budget is
    never kept, even first.
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(score_col).desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("cum_cost", F.sum(cost_col).over(w)).where(
        F.col("cum_cost") <= budget
    )
    return out if keep_cum else out.drop("cum_cost")
