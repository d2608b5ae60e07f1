"""Louvain: exact Python round-replay parity, quality, weights, levels.

The Spark operator is a deterministic synchronous variant (integer
gain2 test, parity-gated rounds, min-member canonical labels), so a
pure-Python replay of the same rules must match it LABEL-FOR-LABEL —
the same oracle style the MIS / coloring / kmeans tests use.
"""

from __future__ import annotations

import collections
import random

from conftest import TRUSS_MINI, edge_df

from linkgraph.graph.edges import canonicalize
from linkgraph.graph.louvain import louvain
from linkgraph.graph.modularity import modularity


# ------------------------------------------------------------ replay --
def _level_rounds_py(ew, rounds):
    nodes = sorted({v for e in ew for v in e})
    k = collections.Counter()
    adj = collections.defaultdict(dict)
    for (a, b), w in ew.items():
        if a == b:
            k[a] += 2 * w
        else:
            k[a] += w
            k[b] += w
            adj[a][b] = adj[a].get(b, 0) + w
            adj[b][a] = adj[b].get(a, 0) + w
    two_m = sum(k.values())
    labels = {v: v for v in nodes}
    if two_m == 0:
        return labels, 0
    moved_total, zero_streak = 0, 0
    for r in range(rounds):
        vol = collections.Counter()
        for v in nodes:
            vol[labels[v]] += k[v]
        new_labels = dict(labels)
        moved = 0
        for v in nodes:
            if (v + r) % 2 != 0:
                continue
            kvc = collections.Counter()
            for u, w in adj[v].items():
                kvc[labels[u]] += w
            a = labels[v]
            kva = kvc.get(a, 0)
            best = None
            for c, wto in kvc.items():
                if c == a:
                    continue
                gain2 = two_m * (wto - kva) - k[v] * (vol[c] - vol[a] + k[v])
                if gain2 > 0 and (best is None or (gain2, -c) > best[0]):
                    best = ((gain2, -c), c)
            if best is not None:
                new_labels[v] = best[1]
                moved += 1
        labels = new_labels
        moved_total += moved
        zero_streak = zero_streak + 1 if moved == 0 else 0
        if zero_streak >= 2:
            break
    return labels, moved_total


def louvain_py(pairs, n_levels=3, rounds_per_level=4):
    ew = collections.Counter()
    for u, v in pairs:
        a, b = min(u, v), max(u, v)
        ew[(a, b)] += 1
    assign = None
    for level in range(n_levels):
        labels, moved = _level_rounds_py(ew, rounds_per_level)
        if assign is None:
            assign = dict(labels)
        else:
            assign = {orig: labels[c] for orig, c in assign.items()}
        if moved == 0 or level == n_levels - 1:
            break
        new = collections.Counter()
        for (a, b), w in ew.items():
            la, lb = labels[a], labels[b]
            new[(min(la, lb), max(la, lb))] += w
        ew = new
    canon = {}
    for orig, c in assign.items():
        canon[c] = min(canon.get(c, orig), orig)
    return {orig: canon[c] for orig, c in assign.items()}


def _spark_labels(edges, **kw):
    res = louvain(edges, **kw)
    return {r["id"]: r["label"] for r in res.labels.collect()}


# -------------------------------------------------------------- tests --
def test_replay_parity_truss_mini(spark, truss_mini):
    got = _spark_labels(truss_mini, n_levels=2, rounds_per_level=3)
    want = louvain_py(TRUSS_MINI, n_levels=2, rounds_per_level=3)
    assert got == want


def test_replay_parity_gnp(spark):
    rng = random.Random(7)
    pairs = sorted(
        {
            (a, b)
            for _ in range(260)
            for a, b in [sorted(rng.sample(range(60), 2))]
        }
    )
    edges = canonicalize(edge_df(spark, pairs))
    got = _spark_labels(edges, n_levels=3, rounds_per_level=4)
    want = louvain_py(pairs, n_levels=3, rounds_per_level=4)
    assert got == want


def test_two_cliques_with_bridge(spark):
    """Planted structure: two K5s + one bridge -> exactly the 2 cliques."""
    k5a = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    k5b = [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    pairs = k5a + k5b + [(4, 10)]
    edges = canonicalize(edge_df(spark, pairs))
    labels = _spark_labels(edges, n_levels=3, rounds_per_level=6)
    comms = collections.defaultdict(set)
    for v, c in labels.items():
        comms[c].add(v)
    assert sorted(map(sorted, comms.values())) == [
        list(range(5)),
        list(range(10, 15)),
    ]
    # canonical labels: min member of each community
    assert set(labels.values()) == {0, 10}
    # and the partition is a positive-modularity one
    lab_df = spark.createDataFrame(
        [(int(v), int(c)) for v, c in labels.items()], "id long, label long"
    )
    q = modularity(edges, lab_df).collect()[0]["modularity"]
    assert q > 0.3


def test_weighted_matches_multigraph(spark):
    """Integer weights == repeating the edge that many times."""
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5)]
    mult = {(0, 1): 3, (1, 2): 3, (0, 2): 3, (2, 3): 1,
            (3, 4): 3, (4, 5): 3, (3, 5): 3}
    wdf = spark.createDataFrame(
        [(a, b, mult[(a, b)]) for a, b in pairs],
        "src long, dst long, w long",
    )
    expanded = [p for p in pairs for _ in range(mult[p])]
    got = _spark_labels(wdf, n_levels=2, rounds_per_level=4, weight_col="w")
    want = louvain_py(expanded, n_levels=2, rounds_per_level=4)
    assert got == want
    assert set(got.values()) == {0, 3}


def test_deterministic_across_runs(spark, truss_mini):
    a = _spark_labels(truss_mini, n_levels=2, rounds_per_level=3)
    b = _spark_labels(truss_mini, n_levels=2, rounds_per_level=3)
    assert a == b
