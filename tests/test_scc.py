"""SCC (FW-BW-MIN) vs an iterative Tarjan oracle."""

from __future__ import annotations

import random

from linkgraph.graph.scc import strongly_connected_components
from tests.conftest import edge_df


def tarjan(pairs):
    """Iterative Tarjan; returns {vertex: min id of its SCC}."""
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        verts.update((a, b))
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, iter(adj.get(root, [])))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on.add(root)
        while work:
            v, it = work[-1]
            advanced = False
            for w in it:
                if w not in index:
                    index[w] = low[w] = counter[0]
                    counter[0] += 1
                    stack.append(w)
                    on.add(w)
                    work.append((w, iter(adj.get(w, []))))
                    advanced = True
                    break
                elif w in on:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
    return out


def collect(res):
    return {r["id"]: r["label"] for r in res.labels.collect()}


def test_two_cycles_and_bridge(spark):
    # cycle {1,2,3} -> bridge -> cycle {4,5}; 6 dangles off 5.
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 4), (5, 6)]
    res = strongly_connected_components(edge_df(spark, pairs))
    assert collect(res) == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_dag_all_singletons(spark):
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4)]
    res = strongly_connected_components(edge_df(spark, pairs))
    assert collect(res) == {i: i for i in range(1, 5)}
    # each round labels at least the SCCs whose F==B (here: peel from
    # the sources inward), so a small DAG needs a few rounds, not |V|.
    assert 1 <= res.rounds <= 4


def test_random_digraph_vs_tarjan(spark):
    rng = random.Random(13)
    n = 60
    pairs = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(240)
        }
    )
    pairs = [(a, b) for a, b in pairs if a != b]
    res = strongly_connected_components(edge_df(spark, pairs))
    assert collect(res) == tarjan(pairs)


def test_chain_of_cycles(spark):
    # k 2-cycles connected in a directed chain: every outer round labels
    # the whole prefix whose F==B, exercising multi-round decomposition.
    k = 4
    pairs = []
    for i in range(k):
        a, b = 2 * i, 2 * i + 1
        pairs += [(a, b), (b, a)]
        if i + 1 < k:
            pairs.append((b, 2 * (i + 1)))
    res = strongly_connected_components(edge_df(spark, pairs))
    assert collect(res) == {2 * i: 2 * i for i in range(k)} | {
        2 * i + 1: 2 * i for i in range(k)
    }


def test_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    res = strongly_connected_components(empty)
    assert res.labels.count() == 0
