"""SALSA vs NumPy degree-normalized power-iteration oracle."""

from __future__ import annotations

import numpy as np

from linkgraph.graph.salsa import salsa
from tests.conftest import edge_df, gnp_graph


def numpy_salsa(pairs, iters=20):
    """Identical semantics: auth from hub via outdeg-normalized
    in-links, then hub from the NEW auth via indeg-normalized
    out-links; L1 norm each half-step; init hub uniform 1/n."""
    ids = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] += 1.0
    outdeg = A.sum(axis=1)
    indeg = A.sum(axis=0)
    wr = np.divide(A, outdeg[:, None], out=np.zeros_like(A), where=outdeg[:, None] > 0)
    wc = np.divide(A, indeg[None, :], out=np.zeros_like(A), where=indeg[None, :] > 0)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = wr.T @ h
        sa = a.sum()
        a = a / sa if sa > 0 else a * 0.0
        h = wc @ a
        sh = h.sum()
        h = h / sh if sh > 0 else h * 0.0
    return (
        {v: h[idx[v]] for v in ids},
        {v: a[idx[v]] for v in ids},
    )


def scores_dicts(df):
    rows = df.collect()
    return (
        {r["id"]: r["hub"] for r in rows},
        {r["id"]: r["auth"] for r in rows},
    )


def assert_close(got, want, tol=1e-9):
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) <= tol, (k, got[k], want[k])


def test_two_hub_star(spark):
    # 1->2, 1->3, 4->2, 4->3: symmetric — every walk distributes
    # evenly, hubs 1/2 each, authorities 1/2 each, from round one.
    pairs = [(1, 2), (1, 3), (4, 2), (4, 3)]
    res = salsa(edge_df(spark, pairs), max_iter=5)
    hub, auth = scores_dicts(res.scores)
    assert_close(hub, {1: 0.5, 4: 0.5, 2: 0.0, 3: 0.0})
    assert_close(auth, {1: 0.0, 4: 0.0, 2: 0.5, 3: 0.5})


def test_authority_proportional_to_indegree(spark):
    # Connected bipartite support graph: SALSA's stationary authority
    # distribution is indegree / |E| (Lempel & Moran §3.2). 10 rounds
    # reach ~6e-3 of the fixpoint (exact semantics are pinned to 1e-9
    # by test_gnp_vs_oracle; this test evidences the analytic limit
    # without paying 60 checkpointed supersteps).
    pairs = [(1, 10), (2, 10), (3, 10), (3, 11), (4, 11), (4, 12)]
    res = salsa(edge_df(spark, pairs), max_iter=10)
    _, auth = scores_dicts(res.scores)
    m = len(pairs)
    want = {10: 3 / m, 11: 2 / m, 12: 1 / m, 1: 0.0, 2: 0.0, 3: 0.0, 4: 0.0}
    assert_close(auth, want, tol=1e-2)


def test_gnp_vs_oracle(spark):
    df = gnp_graph(spark, n=80, p=0.08, seed=11)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    res = salsa(df, max_iter=20)
    hub, auth = scores_dicts(res.scores)
    want_h, want_a = numpy_salsa(pairs, iters=20)
    assert_close(hub, want_h, tol=1e-9)
    assert_close(auth, want_a, tol=1e-9)
