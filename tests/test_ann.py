"""ANN similarity search: brute-force exactness, IVF recall."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from linkgraph.sim.ann import brute_force_topk, ivf_topk


def _vectors(spark, n=200, dim=16, clusters=8, seed=7):
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((clusters, dim))
    rows = []
    for i in range(n):
        v = cents[i % clusters] + 0.1 * rng.standard_normal(dim)
        rows.append((i, [float(x) for x in v], i % clusters))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _numpy_topk(df_rows, qids, k):
    ids = np.array([r[0] for r in df_rows])
    mat = np.stack([np.array(r[1], dtype=np.float64) for r in df_rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    out = {}
    for q in qids:
        qv = mat[list(ids).index(q)]
        scores = mat @ qv
        order = sorted(zip(-scores, ids))  # score desc, id asc
        out[q] = [int(i) for _, i in order[:k]]
    return out


def test_brute_force_matches_numpy(spark):
    df = _vectors(spark)
    rows = [(r["vec_id"], r["embedding"]) for r in df.collect()]
    queries = df.where(F.col("vec_id") < 4)
    got = brute_force_topk(df, queries, k=5)
    by_q = {}
    for r in got.orderBy("query_id", "rank").collect():
        by_q.setdefault(r["query_id"], []).append(r["id"])
    want = _numpy_topk(rows, [0, 1, 2, 3], 5)
    assert by_q == want
    # self is always rank 1 with score ~1
    top1 = {r["query_id"]: (r["id"], r["score"]) for r in got.where("rank = 1").collect()}
    for q, (i, s) in top1.items():
        assert i == q and math.isclose(s, 1.0, abs_tol=1e-9)


def test_ivf_full_probe_is_exact(spark):
    df = _vectors(spark)
    queries = df.where(F.col("vec_id") < 4)
    bf = {
        (r["query_id"], r["rank"]): r["id"]
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["rank"]): r["id"]
        for r in ivf_topk(df, queries, k=5, n_cells=8, n_probe=8).collect()
    }
    assert bf == ivf


def test_ivf_partial_probe_recall(spark):
    df = _vectors(spark)
    queries = df.where(F.col("vec_id") < 8)
    bf = {}
    for r in brute_force_topk(df, queries, k=10).collect():
        bf.setdefault(r["query_id"], set()).add(r["id"])
    ivf = {}
    for r in ivf_topk(df, queries, k=10, n_cells=8, n_probe=3).collect():
        ivf.setdefault(r["query_id"], set()).add(r["id"])
    recalls = [len(bf[q] & ivf.get(q, set())) / len(bf[q]) for q in bf]
    assert sum(recalls) / len(recalls) >= 0.9  # clustered data, 3/8 cells


def test_centroids_are_partition_layout_independent(spark):
    """IVF centroids must be identical regardless of how the corpus is
    partitioned (round-2 verdict: a bare limit().collect() sample made
    cells/recall vary across parallelism levels)."""
    from linkgraph.sim.ann import _train_centroids

    df = _vectors(spark)
    cents = [
        _train_centroids(
            df.repartition(p), "embedding", n_cells=8, sample=64, seed=3
        )
        for p in (1, 2, 13)
    ]
    np.testing.assert_array_equal(cents[0], cents[1])
    np.testing.assert_array_equal(cents[0], cents[2])
