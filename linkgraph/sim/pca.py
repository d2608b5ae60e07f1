"""Distributed PCA over an embedding column.

The whitening/projection step SemDeDup-style pipelines run before
clustering, and the standard dimensionality reduction for ANN indexes.
Scale shape (the reason this is not just numpy): the corpus never
leaves the executors — the d×d Gram matrix is accumulated per Arrow
batch (`mapInPandas`, one BLAS `X^T X` per batch) and the shuffle
carries only (#batches × d(d+1)/2) partial-sum rows, never vectors.
Means come from a JVM-side posexplode average (d rows). Everything
driver-side is bounded by d² doubles (the kmeans-centroid altitude):
covariance assembly, the eigensolve / power iteration, and the
projection matrix broadcast back for the final JVM-side dot products.

Determinism: the Gram partials are float64 BLAS sums — batch order
changes last-ulp bits only, absorbed by the driver rows' round(6)
(same contract as the ANN matmul kernel). Eigenvector sign is fixed by
convention (largest-|loading| entry made positive, first index on
ties), so projections are reproducible run-to-run.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_kernel(dim: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        iu = np.triu_indices(dim)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            G = X.T @ X
            yield pd.DataFrame(
                {"i": iu[0].astype(np.int32), "j": iu[1].astype(np.int32),
                 "s": G[iu]}
            )
    return gen


def embedding_covariance(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, cov): upper-triangle sample covariance (0-based dims).

    cov_ij = (G_ij - n·mu_i·mu_j) / (n - 1) — DuckDB `covar_samp`
    semantics, so the driver row value-checks directly.
    """
    data = emb.select(F.col(vec_col).cast("array<double>").alias("vec"))
    dim = len(data.first()["vec"])
    stats = (
        data.select(F.posexplode("vec").alias("i", "val"))
        .groupBy("i")
        .agg(F.avg("val").alias("mu"), F.count(F.lit(1)).alias("n"))
    )
    gram = (
        data.mapInPandas(_gram_kernel(dim), "i int, j int, s double")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("g"))
    )
    mi = stats.select(F.col("i"), F.col("mu").alias("mu_i"), "n")
    mj = stats.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    return (
        gram.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i", "j",
            # NULL (not an ANSI divide-by-zero) at n == 1 — the same
            # undefined-sample-covariance convention as covar_samp.
            ((F.col("g") - F.col("n") * F.col("mu_i") * F.col("mu_j"))
             / F.nullif(F.col("n") - F.lit(1), F.lit(0))).alias("cov"),
        )
    )


def _cov_matrix(cov_rows, dim: int) -> np.ndarray:
    C = np.zeros((dim, dim))
    for r in cov_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    return C


def _fix_sign(v: np.ndarray) -> np.ndarray:
    k = int(np.argmax(np.abs(v)))  # first index on ties (np.argmax)
    return -v if v[k] < 0 else v


def pca_top_component(
    emb: DataFrame,
    n_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(dim, loading): the leading principal direction after exactly
    ``n_rounds`` power-iteration rounds from the uniform start
    1/sqrt(d) (fixed-round oracle contract; L2-normalized per round,
    sign fixed by convention). Covariance is the distributed kernel;
    the iteration is bounded d² driver math.
    """
    cov = embedding_covariance(emb, id_col=id_col, vec_col=vec_col).collect()
    dim = 1 + max(r["j"] for r in cov)
    C = _cov_matrix(cov, dim)
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(n_rounds):
        v = C @ v
        v = v / np.sqrt(v @ v)
    v = _fix_sign(v)
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(int(i), float(x)) for i, x in enumerate(v)], "dim int, loading double"
    )


def pca_project(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    center: bool = True,
) -> DataFrame:
    """(id, proj): each vector projected onto the top-k principal
    components (exact eigensolve of the d×d covariance on the driver;
    components sign-fixed). The projection itself is a JVM-side
    sequential fold per component — no Python in the per-row path.
    """
    cov = embedding_covariance(emb, id_col=id_col, vec_col=vec_col).collect()
    dim = 1 + max(r["j"] for r in cov)
    C = _cov_matrix(cov, dim)
    w, V = np.linalg.eigh(C)  # ascending
    comps = [_fix_sign(V[:, -1 - i]) for i in range(min(k, dim))]
    mu = np.zeros(dim)
    if center:
        stats = (
            emb.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                       .alias("i", "val"))
            .groupBy("i").agg(F.avg("val").alias("mu")).collect()
        )
        for r in stats:
            mu[r["i"]] = r["mu"]
    data = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    cols = []
    for ci, comp in enumerate(comps):
        carr = F.array(*[F.lit(float(x)) for x in comp])
        centered_dot = F.aggregate(
            F.zip_with(F.col("vec"), carr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) - F.lit(float(mu @ comp))
        cols.append(centered_dot.alias(f"pc{ci}"))
    return data.select("id", F.array(*[c for c in cols]).alias("proj"))
