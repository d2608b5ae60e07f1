"""Luby MIS: python round-replay parity + independence/maximality."""

from __future__ import annotations

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B
from linkgraph.graph.mis import maximal_independent_set
from tests.conftest import complete_graph, edge_df, gnp_graph, path_graph


def brute_luby(pairs, max_iter=100):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    undecided = set(adj)
    mis = set()
    for rnd in range(1, max_iter + 1):
        if not undecided:
            break
        p = {
            v: (_SEED_A * ((v * 131 + rnd) % P1) + _SEED_B) % P1
            for v in undecided
        }
        winners = {
            v
            for v in undecided
            if all((p[v], v) > (p[w], w) for w in adj[v] & undecided)
        }
        mis |= winners
        undecided -= winners
        for v in winners:
            undecided -= adj[v]
    return mis


def check_properties(pairs, members):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v in members:
        assert not (adj[v] & members), f"adjacent members around {v}"
    for v in adj:
        assert v in members or (adj[v] & members), f"{v} has no member neighbor"


def collect(res):
    return {r["id"] for r in res.members.collect()}


def test_path_graph(spark):
    pairs = [(i, i + 1) for i in range(1, 8)]
    got = collect(maximal_independent_set(path_graph(spark, 8)))
    assert got == brute_luby(pairs)
    check_properties(pairs, got)


def test_complete_graph_single_member(spark):
    got = collect(maximal_independent_set(complete_graph(spark, 6)))
    pairs = [(i, j) for i in range(1, 7) for j in range(i + 1, 7)]
    assert len(got) == 1
    assert got == brute_luby(pairs)


def test_gnp_replay_and_properties(spark):
    df = gnp_graph(spark, n=120, p=0.05, seed=21)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    res = maximal_independent_set(df)
    got = collect(res)
    assert got == brute_luby(pairs)
    check_properties(pairs, got)
    assert res.iterations <= 12  # O(log n) rounds in practice


def test_star_graph(spark):
    pairs = [(0, i) for i in range(1, 9)]
    got = collect(maximal_independent_set(edge_df(spark, pairs)))
    assert got == brute_luby(pairs)
    check_properties(pairs, got)
