"""Borůvka MSF vs a Kruskal reference with the identical tiebreak."""

from __future__ import annotations

import random

from linkgraph.graph.msf import minimum_spanning_forest


def _kruskal(pairs):
    """pairs: (src, dst, w); same (w, src, dst) total order as the op."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = []
    for w, s, d in sorted((w, s, d) for s, d, w in pairs):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            forest.append((s, d, w))
    return sorted(forest)


def _wdf(spark, pairs):
    return spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in pairs], "src long, dst long, weight double"
    )


def test_msf_matches_kruskal_random(spark):
    rng = random.Random(13)
    pairs = []
    seen = set()
    for _ in range(400):
        a, b = rng.randrange(0, 80), rng.randrange(0, 80)
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        pairs.append((a, b, rng.randrange(1, 30)))  # duplicate weights on purpose
    res = minimum_spanning_forest(_wdf(spark, pairs))
    got = sorted((r["src"], r["dst"], r["weight"]) for r in res.forest.collect())
    assert got == _kruskal(pairs)
    assert res.n_edges == len(got)


def test_msf_two_components(spark):
    pairs = [(1, 2, 5), (2, 3, 1), (1, 3, 2), (10, 11, 7), (11, 12, 3), (10, 12, 9)]
    res = minimum_spanning_forest(_wdf(spark, pairs))
    got = sorted((r["src"], r["dst"]) for r in res.forest.collect())
    assert got == [(1, 3), (2, 3), (10, 11), (11, 12)]
    # labels: two components
    assert res.labels.select("label").distinct().count() == 2


def test_msf_duplicate_weight_determinism(spark):
    # all weights equal: forest still unique via (w, src, dst) order
    pairs = [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1), (1, 4, 1)]
    a = minimum_spanning_forest(_wdf(spark, pairs))
    b = minimum_spanning_forest(_wdf(spark, pairs))
    rows_a = sorted((r["src"], r["dst"]) for r in a.forest.collect())
    rows_b = sorted((r["src"], r["dst"]) for r in b.forest.collect())
    assert rows_a == rows_b == _kruskal_pairs(pairs)


def _kruskal_pairs(pairs):
    return [(s, d) for s, d, _ in _kruskal(pairs)]


def test_msf_empty_and_single(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    res = minimum_spanning_forest(empty)
    assert res.n_edges == 0 and res.forest.count() == 0
    one = _wdf(spark, [(1, 2, 4)])
    res1 = minimum_spanning_forest(one)
    assert [(r["src"], r["dst"], r["weight"]) for r in res1.forest.collect()] == [
        (1, 2, 4.0)
    ]
