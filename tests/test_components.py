"""Connected components (large-star/small-star) golden + oracle tests."""

from __future__ import annotations

from linkgraph.graph.components import component_of_edges, connected_components
from linkgraph.graph.edges import canonicalize
from tests.conftest import complete_graph, edge_df, gnp_graph, ring_of_cliques


def labels_dict(df):
    return {r["id"]: r["label"] for r in df.collect()}


def brute_components(pairs):
    """Union-find oracle: id -> min vertex id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_truss_mini_single_component(truss_mini):
    labels = labels_dict(connected_components(truss_mini))
    assert labels == {i: 1 for i in range(1, 11)}


def test_small_twitter_single_component(small_twitter):
    labels = labels_dict(connected_components(small_twitter))
    assert labels == {i: 1 for i in range(1, 8)}


def test_two_disjoint_cliques(spark):
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    pairs += [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    labels = labels_dict(connected_components(canonicalize(edge_df(spark, pairs))))
    assert labels == {**{i: 0 for i in range(4)}, **{i: 10 for i in range(10, 14)}}


def test_long_path_converges_logarithmically(spark):
    # A 300-vertex path is the worst case for min-label propagation
    # (O(n) rounds); star contraction must finish well inside 50.
    pairs = [(i, i + 1) for i in range(300)]
    labels = labels_dict(connected_components(canonicalize(edge_df(spark, pairs))))
    assert labels == {i: 0 for i in range(301)}


def test_ring_of_cliques(spark):
    labels = labels_dict(connected_components(canonicalize(ring_of_cliques(spark, 4, 5))))
    assert set(labels.values()) == {0}
    assert len(labels) == 20


def test_gnp_vs_union_find(spark):
    # sparse: many components
    edges = canonicalize(gnp_graph(spark, n=300, p=0.004, seed=7))
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    assert labels_dict(connected_components(edges)) == brute_components(pairs)


def test_component_of_edges(spark):
    pairs = [(1, 2), (2, 3), (10, 11)]
    edges = canonicalize(edge_df(spark, pairs))
    labels = connected_components(edges)
    tagged = component_of_edges(edges, labels)
    rows = {(r["src"], r["dst"]): r["component"] for r in tagged.collect()}
    assert rows == {(1, 2): 1, (2, 3): 1, (10, 11): 10}


def test_delta_workset_matches_star_algorithm(spark, truss_mini):
    from linkgraph.graph.components import connected_components_delta

    # path graph stresses O(diameter) propagation; gnp stresses many
    # components; truss_mini is the reference fixture
    path = canonicalize(edge_df(spark, [(i, i + 1) for i in range(12)]))
    gnp = canonicalize(gnp_graph(spark, n=150, p=0.01, seed=13))
    for g in (truss_mini, path, gnp):
        want = labels_dict(connected_components(g))
        got = labels_dict(connected_components_delta(g))
        assert got == want


def test_incremental_equals_full_recompute(spark):
    """Quotient-contraction incremental CC == full CC on the union."""
    import random

    from linkgraph.graph.components import (
        connected_components,
        incremental_components,
    )
    from tests.conftest import edge_df

    rng = random.Random(13)
    base = [(i, j) for i in range(80) for j in range(i + 1, 80) if rng.random() < 0.02]
    # delta: a few merges plus brand-new vertices 200/201
    delta = [(0, 70), (5, 60), (200, 201), (201, 7)]
    prev = connected_components(edge_df(spark, base))
    inc = incremental_components(prev, edge_df(spark, delta))
    full = connected_components(edge_df(spark, base + delta))
    got = {r["id"]: r["label"] for r in inc.collect()}
    want = {r["id"]: r["label"] for r in full.collect()}
    # full CC sees only edge endpoints; inc additionally keeps previously
    # labeled vertices (same set here since base endpoints all appear)
    assert got == want


def test_incremental_no_op_delta(spark):
    from linkgraph.graph.components import (
        connected_components,
        incremental_components,
    )
    from tests.conftest import edge_df

    base = [(1, 2), (2, 3), (10, 11)]
    prev = connected_components(edge_df(spark, base))
    # delta edge inside an existing component: labeling unchanged
    inc = incremental_components(prev, edge_df(spark, [(1, 3)]))
    assert {r["id"]: r["label"] for r in inc.collect()} == {
        r["id"]: r["label"] for r in prev.collect()
    }
