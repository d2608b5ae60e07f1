"""Deterministic synchronous LPA tests."""

from __future__ import annotations

from linkgraph.graph.edges import canonicalize
from linkgraph.graph.labelprop import label_propagation
from tests.conftest import complete_graph, edge_df


def labels_dict(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_complete_graph_converges_to_one_label(spark):
    res = label_propagation(canonicalize(complete_graph(spark, 6)))
    assert set(labels_dict(res.labels).values()) == {1}
    assert res.changed == 0


def test_disjoint_cliques_get_disjoint_labels(spark):
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    pairs += [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    res = label_propagation(canonicalize(edge_df(spark, pairs)))
    labels = labels_dict(res.labels)
    assert set(labels[i] for i in range(4)) == {0}
    assert set(labels[i] for i in range(10, 14)) == {10}


def test_deterministic_across_runs(spark, small_twitter):
    a = labels_dict(label_propagation(small_twitter, max_iter=10).labels)
    b = labels_dict(label_propagation(small_twitter, max_iter=10).labels)
    assert a == b


def test_labels_cover_all_vertices(truss_mini):
    res = label_propagation(truss_mini, max_iter=10)
    assert set(labels_dict(res.labels)) == set(range(1, 11))
