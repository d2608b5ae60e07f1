"""Data Selection via Importance Resampling (DSIR, Xie et al. 2023).

Not in the reference (no text layer); this is the published recipe for
selecting raw web/corpus documents that look like a curated target set
(Xie, Santurkar, Ma, Liang — "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023): fit bag-of-hashed-n-gram
distributions over the target and the raw corpus, weight every raw
document by its log likelihood ratio, then Gumbel-top-k resample so
the kept subset is distributed like the target.

Plan shape, all JVM-side:

1. explode word unigrams + bigrams -> portable polynomial hash ->
   bucket in [0, n_buckets);
2. TWO map-side-combinable (bucket -> count) aggregates, one per side
   — the distributions are n_buckets rows, broadcast everywhere after;
3. per-raw-doc log-weight = one join of the doc's bucket tfs against
   the broadcast ratio table + one per-doc aggregate;
4. Gumbel key = logw + (-log(-log(u))) with u a deterministic
   avalanche-hash uniform of the doc id (sampling._bucket family), so
   the "random" resample is bit-reproducible in both engines;
5. top-k by key = ordered limit (TakeOrderedAndProject — per-partition
   heaps, no global sort).

Scale notes: the only corpus-sized shuffle is the (doc, bucket) tf
pre-aggregation, whose hottest key is bounded by n_docs (one row per
doc per distinct bucket, same argument as unigram_lm); the ratio table
is n_buckets rows and is explicitly broadcast; the top-k never sorts
the corpus. At 100 TB you'd raise n_buckets to 1e4 (DSIR's published
setting) and swap the portable hash for xxhash64 (`portable=False`) —
the shapes are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.dedup.phash import P1, poly_hash
from linkgraph.sampling import MIX_C1, MIX_C2, _BUCKETS

__all__ = ["hashed_gram_buckets", "importance_weights", "importance_resample"]


def _grams(text_col: str) -> Column:
    """Word unigrams + bigrams of the lower/trim/whitespace tokens."""
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    bigrams = F.when(
        F.size(ws) >= 2,
        F.transform(
            F.slice(ws, 1, F.size(ws) - 1),
            lambda w, i: F.concat(w, F.lit(" "), F.element_at(ws, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(ws, bigrams)


def _gram_bucket(gram: Column, n_buckets: int, portable: bool) -> Column:
    if portable:
        h = poly_hash(gram)
        h = F.pmod(h * h + F.lit(MIX_C1), F.lit(P1))
        h = F.pmod(h * h + F.lit(MIX_C2), F.lit(P1))
    else:
        h = F.pmod(F.xxhash64(gram), F.lit(P1))
    return F.pmod(h, F.lit(n_buckets))


def hashed_gram_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    portable: bool = False,
) -> DataFrame:
    """(id, bucket, tf): per-document hashed-n-gram term frequencies."""
    g = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col), F.explode(_grams(text_col)).alias("gram")
    )
    return (
        g.select(
            id_col,
            _gram_bucket(F.col("gram"), n_buckets, portable).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    portable: bool = False,
) -> DataFrame:
    """(id, n_grams, logw) for every raw doc with at least one token.

    logw = sum over the doc's gram occurrences of
    log(p_target(bucket) / p_raw(bucket)), add-one smoothed.
    """
    raw_tf = hashed_gram_buckets(raw, text_col, id_col, n_buckets, portable)
    tgt_tf = hashed_gram_buckets(target, text_col, id_col, n_buckets, portable)
    raw_dist = raw_tf.groupBy("bucket").agg(F.sum("tf").alias("q_cnt"))
    tgt_dist = tgt_tf.groupBy("bucket").agg(F.sum("tf").alias("p_cnt"))
    # Full outer: buckets seen on one side only still contribute via
    # smoothing. Totals are 1-row broadcasts.
    dist = raw_dist.join(tgt_dist, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("q_cnt", F.lit(0)).alias("q_cnt"),
        F.coalesce("p_cnt", F.lit(0)).alias("p_cnt"),
    )
    totals = dist.agg(
        F.sum("q_cnt").alias("q_tot"), F.sum("p_cnt").alias("p_tot")
    )
    ratio = dist.join(F.broadcast(totals)).select(
        "bucket",
        F.log(
            ((F.col("p_cnt") + 1.0) / (F.col("p_tot") + F.lit(float(n_buckets))))
            / ((F.col("q_cnt") + 1.0) / (F.col("q_tot") + F.lit(float(n_buckets))))
        ).alias("log_ratio"),
    )
    return (
        raw_tf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_grams"),
            F.sum(F.col("tf") * F.col("log_ratio")).alias("logw"),
        )
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    portable: bool = False,
    salt: str = "dsir",
) -> DataFrame:
    """Gumbel-top-k resample of raw docs, weighted toward the target.

    Deterministic: the Gumbel noise comes from the avalanche hash of
    (id, salt), so the selected set is identical across runs, executor
    counts, and engines. Returns (id, n_grams, logw, gumbel_key,
    selected); exactly k rows have selected=true (fewer if raw is
    smaller than k).
    """
    w = importance_weights(raw, target, text_col, id_col, n_buckets, portable)
    tagged = F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    if portable:
        h = poly_hash(tagged)
        h = F.pmod(h * h + F.lit(MIX_C1), F.lit(P1))
        h = F.pmod(h * h + F.lit(MIX_C2), F.lit(P1))
    else:
        h = F.pmod(F.xxhash64(tagged), F.lit(P1))
    u = (F.pmod(h, F.lit(_BUCKETS)) + 0.5) / F.lit(float(_BUCKETS))
    keyed = w.withColumn("gumbel_key", F.col("logw") - F.log(-F.log(u)))
    # Ordered limit = TakeOrderedAndProject (per-partition top-k heaps,
    # no global sort); ties broken by id for determinism.
    top = (
        keyed.orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
        .select(id_col)
    )
    return keyed.join(
        F.broadcast(top.withColumn("selected", F.lit(True))), id_col, "left"
    ).fillna({"selected": False})
