"""Multi-source BFS vs python BFS oracle."""

from __future__ import annotations

from collections import deque

from linkgraph.graph.bfs import bfs_distances
from tests.conftest import SMALL_TWITTER, edge_df, gnp_graph, path_graph, ring_of_cliques


def brute_bfs(pairs, roots, max_depth=10**9):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for r in roots:
        dist = {r: 0}
        q = deque([r])
        while q:
            u = q.popleft()
            if dist[u] >= max_depth:
                continue
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        for v, d in dist.items():
            out[(r, v)] = d
    return out


def collect(df):
    return {(r["root"], r["id"]): r["dist"] for r in df.collect()}


def test_path_graph(spark):
    # path 1-2-...-6 from root 1: dist i-1.
    res = bfs_distances(path_graph(spark, 6), [1])
    assert collect(res.distances) == {(1, i): i - 1 for i in range(1, 7)}
    assert res.iterations == 5


def test_small_twitter_multi_source(small_twitter):
    got = collect(bfs_distances(small_twitter, [1, 4]).distances)
    assert got == brute_bfs(SMALL_TWITTER, [1, 4])


def test_gnp(spark):
    df = gnp_graph(spark, n=100, p=0.05, seed=5)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    roots = sorted({v for e in pairs for v in e})[:3]
    got = collect(bfs_distances(df, roots).distances)
    assert got == brute_bfs(pairs, roots)


def test_depth_cap(spark):
    res = bfs_distances(path_graph(spark, 10), [1], max_depth=3)
    got = collect(res.distances)
    assert got == {(1, i): i - 1 for i in range(1, 5)}  # dist <= 3 only
    assert res.iterations == 3


def test_disconnected_root_isolated(spark):
    # two components; root in the small one never reaches the other.
    df = edge_df(spark, [(1, 2), (3, 4), (4, 5)])
    got = collect(bfs_distances(df, [1, 3]).distances)
    assert got == {(1, 1): 0, (1, 2): 1, (3, 3): 0, (3, 4): 1, (3, 5): 2}


def test_duplicate_sources_dedup(spark):
    got = collect(bfs_distances(path_graph(spark, 4), [2, 2]).distances)
    assert got == {(2, 2): 0, (2, 1): 1, (2, 3): 1, (2, 4): 2}


def test_ring_of_cliques(spark):
    df = ring_of_cliques(spark, m=4, c=3)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    roots = sorted({v for e in pairs for v in e})[:2]
    got = collect(bfs_distances(df, roots).distances)
    assert got == brute_bfs(pairs, roots)


def test_closeness_centrality(spark):
    from linkgraph.graph.bfs import closeness_centrality

    # path 1-2-3-4 from root 1: dists 1,2,3 -> closeness 3/6, harmonic 1+1/2+1/3
    out = closeness_centrality(path_graph(spark, 4), [1]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["root"] == 1 and r["n_reached"] == 3
    assert abs(r["closeness"] - 3 / 6) < 1e-12
    assert abs(r["harmonic"] - (1 + 0.5 + 1 / 3)) < 1e-12


def test_closeness_isolated_root_no_row(spark):
    from linkgraph.graph.bfs import closeness_centrality

    df = edge_df(spark, [(1, 2)])
    # root 5 is not in the graph: BFS reaches nothing beyond itself.
    out = closeness_centrality(df, [5]).collect()
    assert out == []
