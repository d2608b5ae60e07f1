"""Embedding-cosine near-duplicate detection (random-hyperplane LSH).

Candidates come from sign-random-projection buckets (Charikar 2002):
project each embedding onto `n_planes` fixed seeded hyperplanes, bucket
on the sign bit-vector; cosine-close vectors collide with probability
1 − θ/π per bit. Multiple independent bucket tables give recall.
Verification computes exact cosine on candidate pairs.

Implementation split:
- projection: vectorized pandas UDF — one (batch × dim) @ (dim ×
  n_planes) matmul per Arrow batch; planes are generated from a seed
  inside the executor (deterministic, no broadcast needed).
- bucket-join + pair expansion + verify: JVM-side; exact cosine via
  zip_with/aggregate on the float arrays (no second Python hop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_PAIR_EXPR = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), y -> struct(x as id_a, y as id_b))))"
)


def _make_projector(n_planes: int, n_tables: int, seed: int):
    @pandas_udf("array<long>")
    def project(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((mat.shape[1], n_planes * n_tables))
        signs = (mat @ planes) > 0  # (batch, planes*tables)
        keys = []
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        for t in range(n_tables):
            block = signs[:, t * n_planes : (t + 1) * n_planes]
            keys.append(block @ weights + (t << 32))
        return pd.Series(np.stack(keys, axis=1).tolist())

    return project


def cosine_expr(a: str, b: str) -> F.Column:
    """Exact cosine between two array<float> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return dot / (norm(a) * norm(b))


def _portable_buckets(
    vec: F.Column, n_planes: int, n_tables: int, dim: int
) -> F.Column:
    """Bucket-key array from deterministic pseudo-random hyperplanes,
    entirely as Catalyst expressions — the cross-engine twin of the
    numpy projector for oracle-checked paths (see dedup/phash.py).

    Plane p's coefficient at 1-based dim k is phash.plane_coeff(
    p*dim + k); the dot product is a strictly SEQUENTIAL left fold with
    init 0.0, so the IEEE result (and hence every sign bit and bucket
    key) is bit-identical in any engine that mirrors the operation
    order — the DuckDB oracle does (list_reduce over the same
    products).
    """
    from linkgraph.dedup import phash

    def dot(p: int) -> F.Column:
        # two-parameter transform lambda: (element, 0-based index)
        prods = F.transform(
            vec,
            lambda x, d: x * phash.plane_coeff(F.lit(p * dim) + d + F.lit(1)),
        )
        return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)

    keys = []
    for t in range(n_tables):
        base = sum(
            (
                F.when(dot(t * n_planes + j) > 0, F.lit(1 << j))
                .otherwise(F.lit(0))
                .cast("long")
                for j in range(n_planes)
            ),
            start=F.lit(0).cast("long"),
        )
        keys.append(base + F.lit(t << 32).cast("long"))
    return F.array(*keys)


def embedding_near_duplicates(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 1024,
    portable: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) for verified pairs with cosine >= threshold.

    ``portable=True`` swaps the numpy-RNG hyperplanes for deterministic
    mod-P pseudo-random planes evaluated as Catalyst expressions, so a
    DuckDB oracle reproduces the exact buckets and verified pairs; the
    default matmul projector stays the scale path (one BLAS call per
    Arrow batch vs n_planes*n_tables expression folds per row).
    """
    vec_d = F.col(vec_col).cast("array<double>")
    if portable:
        dim = len(df.select(vec_col).first()[0])
        bucket_keys = _portable_buckets(vec_d, n_planes, n_tables, dim)
    else:
        project = _make_projector(n_planes, n_tables, seed)
        bucket_keys = project(vec_d)
    keyed = df.select(
        F.col(id_col).alias("id"), F.explode(bucket_keys).alias("bucket")
    )
    buckets = (
        keyed.groupBy("bucket")
        .agg(F.slice(F.sort_array(F.collect_set("id")), 1, max_bucket).alias("ids"))
        .where(F.size("ids") > 1)
    )
    cands = (
        buckets.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    a = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cosine_expr("vec_a", "vec_b").alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def brute_force_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact all-pairs baseline (id_a < id_b, cosine >= t). O(n²) —
    correctness oracle and small-input fallback, not the scale path."""
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("vec")
    )
    a = vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"))
    b = vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr("vec_a", "vec_b").alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
