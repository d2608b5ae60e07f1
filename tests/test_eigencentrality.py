"""Eigenvector centrality vs numpy power iteration; rich-club vs brute.

The Spark iterate must match a numpy replay of the SAME fixed-round
normalized power iteration bit-for-bit up to summation order (1e-9),
the katz/pagerank contract.
"""

from __future__ import annotations

import numpy as np

from linkgraph.graph.edges import degrees, rich_club_coefficients
from linkgraph.graph.eigencentrality import eigenvector_centrality
from tests.conftest import SMALL_TWITTER, gnp_graph, star_graph


def brute_eigen(pairs, rounds):
    verts = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(verts)}
    a = np.zeros((len(verts), len(verts)))
    for u, w in pairs:
        a[idx[u], idx[w]] = a[idx[w], idx[u]] = 1.0
    x = np.ones(len(verts))
    x = x / np.sqrt((x * x).sum())
    for _ in range(rounds):
        x = a @ x
        n = np.sqrt((x * x).sum())
        if n > 0:
            x = x / n
    return {v: x[idx[v]] for v in verts}


def collect(res):
    return {r["id"]: r["score"] for r in res.scores.collect()}


def test_small_twitter_fixed_rounds(spark, small_twitter):
    got = collect(eigenvector_centrality(small_twitter, max_iter=20))
    want = brute_eigen(SMALL_TWITTER, 20)
    assert got.keys() == want.keys()
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-9


def test_gnp_fixed_rounds(spark):
    df = gnp_graph(spark, n=60, p=0.08, seed=23)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    got = collect(eigenvector_centrality(df, max_iter=15))
    want = brute_eigen(pairs, 15)
    for v, w in want.items():
        assert abs(got[v] - w) < 1e-9


def test_star_hub_dominates(spark):
    got = collect(eigenvector_centrality(star_graph(spark, 8), max_iter=30))
    assert got[0] == max(got.values())
    leaves = [got[i] for i in range(1, 9)]
    assert max(leaves) - min(leaves) < 1e-12
    # unit norm
    assert abs(sum(v * v for v in got.values()) - 1.0) < 1e-9


def test_tolerance_stop(spark, small_twitter):
    res = eigenvector_centrality(small_twitter, max_iter=200, tol=1e-10)
    assert res.iterations < 200


# ---------------------------------------------------------------- rich club


def brute_rich_club(pairs):
    deg: dict[int, int] = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    ks = sorted(set(deg.values()) | {min(deg[u], deg[v]) for u, v in pairs})
    out = {}
    for k in ks:
        club = {v for v, d in deg.items() if d > k}
        if len(club) < 2:
            continue
        e = sum(1 for u, v in pairs if u in club and v in club)
        out[k] = (len(club), e, 2.0 * e / (len(club) * (len(club) - 1)))
    return out


def test_rich_club_gnp(spark):
    df = gnp_graph(spark, n=80, p=0.07, seed=9)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    got = {
        r["k"]: (r["n_rich"], r["e_rich"], r["phi"])
        for r in rich_club_coefficients(df).collect()
    }
    want = brute_rich_club(pairs)
    assert got.keys() == want.keys()
    for k, (n, e, phi) in want.items():
        assert got[k][0] == n and got[k][1] == e
        assert abs(got[k][2] - phi) < 1e-12


def test_rich_club_star(spark):
    # star: hub degree n, leaves degree 1. k=1 club = {hub} (size 1,
    # dropped); the only emitted threshold is the one below the leaf
    # degree... which doesn't exist, so expect empty output.
    df = star_graph(spark, 8)
    rows = rich_club_coefficients(df).collect()
    assert rows == []


def test_rich_club_clique_is_one(spark):
    from tests.conftest import complete_graph

    df = complete_graph(spark, 6)  # all degrees 5
    # thresholds k in {5} have empty clubs; no rows with n>=2 except none
    # ... but k=min-degree histogram also {5}: club of degree>5 is empty.
    assert rich_club_coefficients(df).collect() == []
    # add a pendant vertex to create threshold k=1 with the K6 as club
    extra = df.sparkSession.createDataFrame([(1, 99)], "src long, dst long")
    df2 = df.unionByName(extra)
    rows = {r["k"]: r for r in rich_club_coefficients(df2).collect()}
    # k=1: club = K6 members (vertex 1 has degree 6, the rest 5, all
    # > 1); the pendant (degree 1) is excluded.
    assert rows[1]["n_rich"] == 6 and rows[1]["e_rich"] == 15
    assert abs(rows[1]["phi"] - 1.0) < 1e-12
