"""Topological layering + condensation vs python longest-path oracle."""

from __future__ import annotations

from functools import lru_cache

from linkgraph.graph.layers import condensation, topological_layers
from linkgraph.graph.scc import strongly_connected_components
from tests.conftest import edge_df


def brute_layers(pairs):
    preds: dict[int, set[int]] = {}
    verts = set()
    for a, b in pairs:
        preds.setdefault(b, set()).add(a)
        verts.update((a, b))

    @lru_cache(maxsize=None)
    def layer(v):
        ps = preds.get(v, set())
        return 0 if not ps else 1 + max(layer(u) for u in ps)

    return {v: layer(v) for v in verts}


def collect(df):
    return {r["id"]: r["layer"] for r in df.collect()}


def test_diamond_dag(spark):
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)]
    res = topological_layers(edge_df(spark, pairs))
    assert res.converged
    assert collect(res.layers) == brute_layers(pairs)


def test_longest_path_wins(spark):
    # 1->5 direct, but 1->2->3->4->5 forces layer(5)=4
    pairs = [(1, 5), (1, 2), (2, 3), (3, 4), (4, 5)]
    res = topological_layers(edge_df(spark, pairs))
    assert res.converged
    got = collect(res.layers)
    assert got == brute_layers(pairs)
    assert got[5] == 4


def test_random_dag(spark):
    import random

    rng = random.Random(5)
    pairs = [
        (i, j)
        for i in range(40)
        for j in range(i + 1, 40)
        if rng.random() < 0.08
    ]
    res = topological_layers(edge_df(spark, pairs))
    assert res.converged
    assert collect(res.layers) == brute_layers(pairs)


def test_cycle_reports_not_converged(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4)]
    res = topological_layers(edge_df(spark, pairs), max_iter=12)
    assert not res.converged
    assert res.iterations == 12


def test_explicit_vertices_include_isolated(spark):
    df = edge_df(spark, [(1, 2)])
    verts = spark.createDataFrame([(1,), (2,), (9,)], "id long")
    res = topological_layers(df, vertices=verts)
    assert res.converged
    assert collect(res.layers) == {1: 0, 2: 1, 9: 0}


def test_resume_from_checkpoint(spark, tmp_path):
    from linkgraph.checkpoint import Checkpointer

    # deep chain => many rounds; cut the first run short, resume, and
    # land on the same fixpoint as an uncheckpointed run.
    pairs = [(i, i + 1) for i in range(12)] + [(0, 12)]
    df = edge_df(spark, pairs)
    want = collect(topological_layers(df).layers)

    ck = Checkpointer(spark, dir=str(tmp_path), job="topo")
    partial = topological_layers(df, max_iter=3, checkpointer=ck)
    assert not partial.converged
    assert ck.latest() == 3

    ck2 = Checkpointer(spark, dir=str(tmp_path), job="topo")
    resumed = topological_layers(df, checkpointer=ck2)
    assert resumed.converged
    assert resumed.counters[0].get("resumed")
    assert collect(resumed.layers) == want


def test_condensation_is_acyclic_and_layerable(spark):
    # two 3-cycles joined by a bridge plus a tail
    pairs = [(1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 12), (12, 10), (12, 20)]
    df = edge_df(spark, pairs)
    labels = strongly_connected_components(df).labels
    dag = condensation(df, labels)
    got_edges = {(r["src"], r["dst"]) for r in dag.collect()}
    # each cycle contracts to its min id: {1}, {10}; bridge edges survive
    assert got_edges == {(1, 10), (10, 20)}
    res = topological_layers(dag)
    assert res.converged
    assert collect(res.layers) == {1: 0, 10: 1, 20: 2}
