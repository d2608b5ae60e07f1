"""Landmark betweenness vs a pure-python Brandes implementation."""

from __future__ import annotations

from collections import deque

from linkgraph.graph.betweenness import betweenness_centrality, edge_betweenness
from tests.conftest import SMALL_TWITTER, edge_df, gnp_graph, path_graph


def brute_brandes(pairs, sources):
    """Brandes 2001, partial sums from `sources` (unnormalized)."""
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    bc = {v: 0.0 for v in adj}
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for u in adj[w]:
                if dist.get(u, -2) == dist[w] - 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return bc


def collect(res):
    return {r["id"]: r["betweenness"] for r in res.scores.collect()}


def assert_close(got, want, reached):
    for v in reached:
        assert abs(got.get(v, 0.0) - want.get(v, 0.0)) < 1e-9, (
            v, got.get(v), want.get(v))


def test_path_graph_exact(spark):
    # path 1-2-3-4-5, all sources: interior vertices bridge everything
    pairs = [(i, i + 1) for i in range(1, 5)]
    sources = [1, 2, 3, 4, 5]
    got = collect(betweenness_centrality(path_graph(spark, 5), sources))
    want = brute_brandes(pairs, sources)
    assert_close(got, want, want.keys())
    # endpoint has zero betweenness; middle has the max
    assert got.get(1, 0.0) == 0.0
    assert got[3] == max(got.values())


def test_small_twitter_landmarks(spark, small_twitter):
    sources = [1, 4, 7]
    got = collect(betweenness_centrality(small_twitter, sources))
    want = brute_brandes(SMALL_TWITTER, sources)
    assert_close(got, want, want.keys())


def test_gnp_all_sources_exact(spark):
    df = gnp_graph(spark, n=40, p=0.12, seed=9)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    verts = sorted({x for p in pairs for x in p})
    got = collect(betweenness_centrality(df, verts))
    want = brute_brandes(pairs, verts)
    assert_close(got, want, verts)


def brute_edge_brandes(pairs, sources):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    eb: dict[tuple[int, int], float] = {}
    for s in sources:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for u in adj[w]:
                if dist.get(u, -2) == dist[w] - 1:
                    d = sigma[u] / sigma[w] * (1 + delta[w])
                    delta[u] += d
                    k = (min(u, w), max(u, w))
                    eb[k] = eb.get(k, 0.0) + d
    return eb


def test_edge_betweenness_matches_brute(spark):
    df = gnp_graph(spark, n=40, p=0.12, seed=9)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    sources = sorted({x for p in pairs for x in p})[:6]
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness(df, sources).collect()
    }
    want = brute_edge_brandes(pairs, sources)
    assert got.keys() == want.keys()
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9, (k, got[k], v)


def test_edge_betweenness_bridge_dominates(spark):
    # two triangles joined by one bridge: the bridge carries all
    # cross-cluster dependency mass
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)]
    sources = [1, 2, 3, 4, 5, 6]
    got = {
        (r["src"], r["dst"]): r["betweenness"]
        for r in edge_betweenness(edge_df(spark, pairs), sources).collect()
    }
    assert max(got, key=got.get) == (3, 4)
    want = brute_edge_brandes(pairs, sources)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-9


def test_star_center_carries_everything(spark):
    pairs = [(0, i) for i in range(1, 6)]
    sources = [1, 2, 3, 4, 5]
    got = collect(betweenness_centrality(edge_df(spark, pairs), sources))
    want = brute_brandes(pairs, sources)
    assert_close(got, want, want.keys())
    # center mediates all 4 other leaves per source: 5 sources * 4
    assert abs(got[0] - 20.0) < 1e-9
