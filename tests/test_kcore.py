"""k-core decomposition and global transitivity tests."""

from __future__ import annotations

from collections import Counter

import pytest

from linkgraph.graph.edges import canonicalize
from linkgraph.graph.kcore import core_numbers, k_core
from linkgraph.graph.triangles import transitivity
from tests.conftest import TRUSS_MINI, complete_graph, edge_df


def _py_k_core(pairs, k):
    """Reference peel: drop vertices with degree < k until stable."""
    edges = {tuple(sorted(p)) for p in pairs}
    while True:
        deg = Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        low = {v for v, d in deg.items() if d < k}
        if not low:
            return edges
        edges = {e for e in edges if low.isdisjoint(e)}


def _py_core_numbers(pairs, k_max=64):
    verts = {v for p in pairs for v in p}
    core = {v: 1 for v in verts}
    edges = {tuple(sorted(p)) for p in pairs}
    for k in range(2, k_max + 1):
        edges = _py_k_core(edges, k)
        if not edges:
            break
        for v in {v for e in edges for v in e}:
            core[v] = k
    return core


def test_k_core_matches_reference_peel(spark, truss_mini):
    for k in (2, 3, 4, 5):
        res = k_core(truss_mini, k)
        got = {tuple(sorted((r["src"], r["dst"]))) for r in res.edges.collect()}
        assert got == _py_k_core(TRUSS_MINI, k), k
        assert res.n_edges == len(got)


def test_k_core_monotone_in_k(spark, truss_mini):
    prev = None
    for k in (2, 3, 4, 5, 6):
        cur = {
            tuple(sorted((r["src"], r["dst"])))
            for r in k_core(truss_mini, k).edges.collect()
        }
        if prev is not None:
            assert cur <= prev
        prev = cur


def test_core_numbers_match_reference(spark, truss_mini):
    got = {r["id"]: r["core"] for r in core_numbers(truss_mini).collect()}
    assert got == _py_core_numbers(TRUSS_MINI)


def test_transitivity_complete_and_path(spark):
    k5 = canonicalize(complete_graph(spark, 5))
    row = transitivity(k5).collect()[0]
    assert (row["n_triangles"], row["n_wedges"]) == (10, 30)
    assert row["transitivity"] == 1.0
    path = canonicalize(edge_df(spark, [(1, 2), (2, 3), (3, 4)]))
    row = transitivity(path).collect()[0]
    assert row["n_triangles"] == 0 and row["transitivity"] == 0.0


def test_degree_assortativity_star_is_minus_one(spark):
    from linkgraph.graph.edges import degree_assortativity

    star = canonicalize(edge_df(spark, [(0, 1), (0, 2), (0, 3)]))
    row = degree_assortativity(star).collect()[0]
    assert row["assortativity"] == pytest.approx(-1.0, abs=1e-12)


# ---------------------------------------------------------------- graph diff


def test_graph_diff_and_degree_drift(spark):
    from linkgraph.graph.edges import degree_drift, graph_diff
    from tests.conftest import edge_df

    old = [(1, 2), (2, 3), (3, 4)]
    new = [(1, 2), (2, 3), (4, 5), (5, 6)]
    row = graph_diff(edge_df(spark, old), edge_df(spark, new)).collect()[0]
    assert (row["n_old"], row["n_new"]) == (3, 4)
    assert (row["n_added"], row["n_removed"], row["n_common"]) == (2, 1, 2)
    assert abs(row["jaccard"] - 2 / 5) < 1e-12
    drift = {
        r["id"]: (r["deg_old"], r["deg_new"], r["delta"])
        for r in degree_drift(edge_df(spark, old), edge_df(spark, new)).collect()
    }
    # vertex 3 loses the (3,4) edge; 4 swaps partner (no change); 5,6 appear
    assert drift[3] == (2, 1, -1)
    assert 4 not in drift
    assert drift[5] == (0, 2, 2) and drift[6] == (0, 1, 1)
    # identical graphs: empty drift, jaccard 1
    same = graph_diff(edge_df(spark, old), edge_df(spark, old)).collect()[0]
    assert same["jaccard"] == 1.0 and same["n_added"] == same["n_removed"] == 0


def test_power_law_alpha_replay(spark):
    import math

    from linkgraph.graph.edges import power_law_alpha
    from tests.conftest import edge_df

    # star-heavy graph: hub 0 plus small attachments
    pairs = [(0, i) for i in range(1, 40)] + [(1, 2), (3, 4), (5, 6), (1, 3)]
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    d_min = 2
    tail = [d for d in deg.values() if d >= d_min]
    want = 1 + len(tail) / sum(math.log(d / (d_min - 0.5)) for d in tail)
    row = power_law_alpha(edge_df(spark, pairs), d_min=d_min).collect()[0]
    assert row["n_tail"] == len(tail)
    assert abs(row["alpha"] - want) < 1e-12
