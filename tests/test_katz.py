"""Katz centrality vs numpy fixed-round iteration."""

from __future__ import annotations

import numpy as np

from linkgraph.graph.katz import katz_centrality
from tests.conftest import SMALL_TWITTER, gnp_graph, star_graph


def brute_katz(pairs, alpha, beta, rounds):
    verts = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(verts)}
    a = np.zeros((len(verts), len(verts)))
    for u, w in pairs:
        a[idx[u], idx[w]] = a[idx[w], idx[u]] = 1.0
    x = np.full(len(verts), beta)
    for _ in range(rounds):
        x = beta + alpha * (a @ x)
    return {v: x[idx[v]] for v in verts}


def collect(res):
    return {r["id"]: r["katz"] for r in res.scores.collect()}


def test_small_twitter_fixed_rounds(spark, small_twitter):
    got = collect(katz_centrality(small_twitter, alpha=0.05, max_iter=20))
    want = brute_katz(SMALL_TWITTER, 0.05, 1.0, 20)
    assert got.keys() == want.keys()
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-9


def test_gnp_fixed_rounds(spark):
    df = gnp_graph(spark, n=60, p=0.08, seed=17)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    got = collect(katz_centrality(df, alpha=0.02, max_iter=15))
    want = brute_katz(pairs, 0.02, 1.0, 15)
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-9


def test_star_hub_dominates(spark):
    df = star_graph(spark, 8)
    got = collect(katz_centrality(df, alpha=0.05, max_iter=30))
    assert got[0] == max(got.values())
    leaves = [got[i] for i in range(1, 9)]
    assert max(leaves) - min(leaves) < 1e-12


def test_tolerance_stop(spark, small_twitter):
    res = katz_centrality(small_twitter, alpha=0.05, max_iter=100, tol=1e-12)
    assert res.iterations < 100
    # fixpoint: one more round changes nothing beyond tol
    again = katz_centrality(
        small_twitter, alpha=0.05, max_iter=res.iterations + 1, tol=0.0
    )
    a, b = collect(res), collect(again)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-9
