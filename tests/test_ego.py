"""Ego networks vs brute-force python."""

from __future__ import annotations

from linkgraph.graph.ego import ego_network
from tests.conftest import edge_df, gnp_graph


def brute_ego(pairs, roots, k):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts, eds = {}, {}
    for r in roots:
        dist = {r: 0}
        frontier = [r]
        for d in range(1, k + 1):
            nxt = []
            for u in frontier:
                for w in adj.get(u, ()):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        verts[r] = dist
        eds[r] = {(a, b) for a, b in pairs if a in dist and b in dist}
    return verts, eds


def test_ego_matches_bruteforce(spark):
    pairs = [(a, b) for a, b in gnp_graph(spark, n=40, p=0.06, seed=5).collect()]
    df = edge_df(spark, pairs)
    roots = sorted({v for e in pairs for v in e})[:3]
    ego = ego_network(df, roots, k=2)
    vw, ew = brute_ego(pairs, roots, 2)
    gv = {}
    for r in ego.vertices.collect():
        gv.setdefault(r["root"], {})[r["id"]] = r["dist"]
    assert gv == vw
    ge = {}
    for r in ego.edges.collect():
        ge.setdefault(r["root"], set()).add((r["src"], r["dst"]))
    assert ge == {r: s for r, s in ew.items() if s}


def test_ego_k1_star(spark):
    # star 1-{2,3,4} plus edge 2-3: ego(1, k=1) keeps 2-3 (induced).
    df = edge_df(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (3, 5)])
    ego = ego_network(df, [1], k=1)
    verts = {(r["id"], r["dist"]) for r in ego.vertices.collect()}
    assert verts == {(1, 0), (2, 1), (3, 1), (4, 1)}
    eds = {(r["src"], r["dst"]) for r in ego.edges.collect()}
    assert eds == {(1, 2), (1, 3), (1, 4), (2, 3)}
