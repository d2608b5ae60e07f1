"""Deterministic random walks vs a python replay of the same hash."""

from __future__ import annotations

from linkgraph.graph.walks import (
    A_WALK, B_WALK, C_WALK, P_WALK, random_walks, walk_corpus,
)
from tests.conftest import edge_df, gnp_graph, path_graph


def py_walks(pairs, walk_length, walks_per_vertex=1, directed=False):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    adj = {v: sorted(ns) for v, ns in adj.items()}
    out = {}
    for v in sorted(adj):
        for k in range(walks_per_vertex):
            wid = v * walks_per_vertex + k
            path, cur = [v], v
            for step in range(walk_length):
                ns = adj.get(cur)
                if not ns:
                    break
                h = ((wid % P_WALK) * A_WALK + step * B_WALK + C_WALK) % P_WALK
                cur = ns[h % len(ns)]
                path.append(cur)
            out[wid] = path
    return out


def collect(df):
    return {r["walk_id"]: list(r["path"]) for r in df.collect()}


def test_walks_match_python_replay(spark):
    pairs = [(a, b) for a, b in gnp_graph(spark, n=30, p=0.12, seed=3).collect()]
    df = edge_df(spark, pairs)
    got = collect(random_walks(df, walk_length=12, walks_per_vertex=2))
    assert got == py_walks(pairs, 12, 2)


def test_walks_deterministic_across_runs(spark):
    df = gnp_graph(spark, n=25, p=0.15, seed=8)
    a = collect(random_walks(df, walk_length=7))
    b = collect(random_walks(df, walk_length=7))
    assert a == b


def test_directed_sink_stops_early(spark):
    # 1 -> 2 -> 3, vertex 3 is a sink: every walk ends there.
    df = edge_df(spark, [(1, 2), (2, 3)])
    got = collect(random_walks(df, walk_length=5, directed=True))
    assert got == {1: [1, 2, 3], 2: [2, 3]}  # only vertices with out-edges start


def test_walk_corpus_shape(spark):
    df = path_graph(spark, 4)
    rows = walk_corpus(df, walk_length=3).collect()
    by_walk = {}
    for r in rows:
        by_walk.setdefault(r["walk_id"], []).append((r["step"], r["vertex"]))
    for wid, steps in by_walk.items():
        steps.sort()
        assert [s for s, _ in steps] == list(range(len(steps)))
        assert len(steps) == 4  # path graph: no sinks, full length + start


def _py_node2vec(pairs, L, wpv, p, q):
    from linkgraph.graph.walks import A_WALK, B_WALK, C_WALK, P_WALK

    adj: dict[int, list[int]] = {}
    eset = set()
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
        eset.add((min(a, b), max(a, b)))
    adj = {v: sorted(set(ns)) for v, ns in adj.items()}
    walks = {}
    for v in adj:
        for k in range(wpv):
            wid = v * wpv + k
            path = [v]
            # step 0: uniform
            h = ((wid % P_WALK) * A_WALK + (0 * B_WALK + C_WALK)) % P_WALK
            path.append(adj[v][h % len(adj[v])])
            for step in range(1, L):
                prev, cur = path[-2], path[-1]
                cands = adj[cur]
                ws = [
                    q if x == prev
                    else (p * q if (min(prev, x), max(prev, x)) in eset else p)
                    for x in cands
                ]
                h = ((wid % P_WALK) * A_WALK + (step * B_WALK + C_WALK)) % P_WALK
                r = h % sum(ws)
                acc = 0
                for x, w in zip(cands, ws):
                    acc += w
                    if r < acc:
                        path.append(x)
                        break
            walks[wid] = path
    return walks


def test_node2vec_matches_python_replay(spark):
    from linkgraph.graph.walks import node2vec_walks
    from tests.conftest import gnp_graph

    g = gnp_graph(spark, n=40, p=0.12, seed=21)
    pairs = [(r["src"], r["dst"]) for r in g.collect()]
    res = node2vec_walks(g, walk_length=6, walks_per_vertex=2, p=4, q=1)
    got = {r["walk_id"]: list(r["path"]) for r in res.collect()}
    want = _py_node2vec(pairs, 6, 2, 4, 1)
    assert got == want


def test_node2vec_p1q1_is_valid_walk(spark):
    from linkgraph.graph.walks import node2vec_walks
    from tests.conftest import ring_of_cliques

    g = ring_of_cliques(spark, 3, 4)
    eset = {(min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in g.collect()}
    res = node2vec_walks(g, walk_length=5, walks_per_vertex=1)
    for r in res.collect():
        path = list(r["path"])
        assert len(path) == 6
        for a, b in zip(path, path[1:]):
            assert (min(a, b), max(a, b)) in eset
