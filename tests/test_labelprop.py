"""Deterministic synchronous LPA tests."""

from __future__ import annotations

import random

import linkgraph.graph.labelprop as lpa_mod
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


def _random_graph(spark, n=60, m=150, seed=11):
    rng = random.Random(seed)
    pairs = {
        (a, b)
        for a, b in (
            sorted(rng.sample(range(n), 2)) for _ in range(m)
        )
    }
    return canonicalize(edge_df(spark, sorted(pairs)))


def test_delta_workset_matches_full_recompute(spark, truss_mini, monkeypatch):
    """Delta rounds (only changed-neighbor vertices recompute) must reach
    the identical fixpoint as full per-round recomputation, in both
    broadcast and shuffle modes."""
    g = _random_graph(spark)
    for graph in (truss_mini, g):
        monkeypatch.setattr(lpa_mod, "_DELTA_FRACTION", -1.0)  # never delta
        full = label_propagation(graph, max_iter=12)
        assert all(c["mode"] == "full" for c in full.counters)
        monkeypatch.setattr(lpa_mod, "_DELTA_FRACTION", 2.0)  # delta from round 2
        delta = label_propagation(graph, max_iter=12)
        assert any(c["mode"] == "delta" for c in delta.counters)
        assert labels_dict(full.labels) == labels_dict(delta.labels)
        # shuffle mode exercises the symmetric-swap semi-join
        monkeypatch.setattr(lpa_mod, "_BROADCAST_LABELS_LIMIT", 0)
        delta_sh = label_propagation(graph, max_iter=12)
        assert any(c["mode"] == "delta" for c in delta_sh.counters)
        assert labels_dict(full.labels) == labels_dict(delta_sh.labels)
        monkeypatch.setattr(lpa_mod, "_BROADCAST_LABELS_LIMIT", 5_000_000)


def test_period2_oscillation_detected_and_canonicalized(spark):
    """Synchronous LPA on an even cycle never reaches a fixpoint — it
    settles into a period-2 orbit (all-odd / all-even phase labels).
    The loop must prove the orbit via state(t+1) == state(t-1), stop
    early, and canonicalize each vertex to the min of its two phase
    labels — here the single community label 0."""
    c4 = canonicalize(edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)]))
    res = label_propagation(c4, max_iter=50)
    assert res.oscillating
    assert res.iterations < 50
    assert set(labels_dict(res.labels).values()) == {0}
    # deterministic across phase alignments: a second run agrees exactly
    res2 = label_propagation(c4, max_iter=50)
    assert labels_dict(res.labels) == labels_dict(res2.labels)


def test_converging_graphs_unaffected_by_period2_rule(spark):
    """On a plainly converging graph the oscillation branch must never
    fire and the fixpoint must equal the pre-rule semantics."""
    res = label_propagation(canonicalize(complete_graph(spark, 6)))
    assert not res.oscillating and res.changed == 0
    assert all(c["changed_vs_2_rounds_ago"] is not None for c in res.counters)


# ------------------------------------------------- seeded variant --
def _py_seeded(pairs, seeds, n_rounds):
    import collections

    adj = collections.defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    labels = {v: seeds.get(v) for v in adj}
    for _ in range(n_rounds):
        new = dict(labels)
        for v in adj:
            if v in seeds:
                continue
            votes = collections.Counter(
                labels[u] for u in adj[v] if labels[u] is not None
            )
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        labels = new
    return labels


def test_seeded_replay_parity(spark):
    import random

    from linkgraph.graph.edges import canonicalize
    from linkgraph.graph.labelprop import seeded_label_propagation

    rng = random.Random(17)
    pairs = sorted({tuple(sorted(rng.sample(range(80), 2))) for _ in range(200)})
    seeds = {3: 100, 11: 200, 42: 300}
    sdf = spark.createDataFrame(list(seeds.items()), "id long, label long")
    got = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            canonicalize(edge_df(spark, pairs)), sdf, n_rounds=3
        ).collect()
    }
    want = _py_seeded(pairs, seeds, 3)
    assert got == want
    assert any(v is None for v in got.values()) or all(
        v is not None for v in got.values()
    )


def test_seeded_two_cliques(spark):
    from linkgraph.graph.edges import canonicalize
    from linkgraph.graph.labelprop import seeded_label_propagation

    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs = k5a + k5b + [(4, 10)]
    sdf = spark.createDataFrame([(0, 111), (14, 222)], "id long, label long")
    got = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            canonicalize(edge_df(spark, pairs)), sdf, n_rounds=4
        ).collect()
    }
    assert all(got[v] == 111 for v in range(5))
    assert all(got[v] == 222 for v in range(10, 15))
    # seeds never flip even when outvoted by the other clique's labels
    assert got[0] == 111 and got[14] == 222


def test_seeded_unreached_stay_null(spark):
    from linkgraph.graph.edges import canonicalize
    from linkgraph.graph.labelprop import seeded_label_propagation

    pairs = [(0, 1), (2, 3)]  # two components, one seeded
    sdf = spark.createDataFrame([(0, 9)], "id long, label long")
    got = {
        r["id"]: r["label"]
        for r in seeded_label_propagation(
            canonicalize(edge_df(spark, pairs)), sdf, n_rounds=5
        ).collect()
    }
    assert got == {0: 9, 1: 9, 2: None, 3: None}
