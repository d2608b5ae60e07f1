"""Jones–Plassmann coloring: python round-replay parity + properness."""

from __future__ import annotations

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B
from linkgraph.graph.coloring import greedy_coloring
from tests.conftest import complete_graph, edge_df, gnp_graph, path_graph


def _prio(v):
    return (_SEED_A * ((v * 131) % P1) + _SEED_B) % P1


def brute_jp(pairs, max_iter=200):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    color: dict[int, int] = {}
    uncolored = set(adj)
    for _ in range(max_iter):
        if not uncolored:
            break
        winners = {
            v
            for v in uncolored
            if all(
                (_prio(v), v) > (_prio(w), w) for w in adj[v] & uncolored
            )
        }
        for v in winners:
            used = {color[w] for w in adj[v] if w in color}
            c = 0
            while c in used:
                c += 1
            color[v] = c
        uncolored -= winners
    return color


def check_proper(pairs, colors):
    for a, b in pairs:
        assert colors[a] != colors[b], (a, b, colors[a])


def collect(res):
    return {r["id"]: r["color"] for r in res.colors.collect()}


def test_path_graph_two_colors(spark):
    pairs = [(i, i + 1) for i in range(1, 8)]
    got = collect(greedy_coloring(path_graph(spark, 8)))
    assert got == brute_jp(pairs)
    check_proper(pairs, got)
    assert max(got.values()) <= 2  # greedy on a path uses <= 3, usually 2


def test_complete_graph_needs_n_colors(spark):
    pairs = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
    got = collect(greedy_coloring(complete_graph(spark, 5)))
    assert got == brute_jp(pairs)
    assert sorted(got.values()) == [0, 1, 2, 3, 4]


def test_gnp_replay_and_proper(spark):
    df = gnp_graph(spark, n=100, p=0.06, seed=13)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    res = greedy_coloring(df)
    got = collect(res)
    assert got == brute_jp(pairs)
    check_proper(pairs, got)
    # greedy bound: colors <= max degree + 1
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert max(got.values()) <= max(deg.values())


def test_star_graph(spark):
    pairs = [(0, i) for i in range(1, 9)]
    got = collect(greedy_coloring(edge_df(spark, pairs)))
    assert got == brute_jp(pairs)
    check_proper(pairs, got)
    assert max(got.values()) == 1
