"""Attribute mixing / assortativity vs a Python replay and goldens."""

from __future__ import annotations

from collections import Counter

from linkgraph.graph.mixing import attribute_assortativity, mixing_matrix
from tests.conftest import edge_df


def py_assort(pairs, attr):
    ends = Counter()
    for u, v in pairs:
        if u in attr and v in attr:
            ends[(attr[u], attr[v])] += 1
            ends[(attr[v], attr[u])] += 1
    tot = sum(ends.values())
    e = {k: n / tot for k, n in ends.items()}
    cats = {c for k in e for c in k}
    a = {i: sum(e.get((i, j), 0.0) for j in cats) for i in cats}
    b = {j: sum(e.get((i, j), 0.0) for i in cats) for j in cats}
    trace = sum(e.get((i, i), 0.0) for i in cats)
    chance = sum(a[i] * b[i] for i in cats)
    r = None if chance >= 1.0 else (trace - chance) / (1 - chance)
    return e, trace, chance, r


def _attr_df(spark, attr):
    return spark.createDataFrame(
        [(k, v) for k, v in attr.items()], "id long, attr string"
    )


def test_matrix_and_r_vs_replay(spark):
    import random

    rng = random.Random(3)
    pairs = [
        (i, j) for i in range(30) for j in range(i + 1, 30) if rng.random() < 0.2
    ]
    attr = {i: "xyz"[i % 3] for i in range(30)}
    e, trace, chance, r = py_assort(pairs, attr)
    m = {
        (row["attr_a"], row["attr_b"]): row["frac"]
        for row in mixing_matrix(edge_df(spark, pairs), _attr_df(spark, attr)).collect()
    }
    assert set(m) == set(e)
    for k in e:
        assert abs(m[k] - e[k]) < 1e-12
    got = attribute_assortativity(
        edge_df(spark, pairs), _attr_df(spark, attr)
    ).collect()[0]
    assert abs(got["trace"] - trace) < 1e-12
    assert abs(got["chance"] - chance) < 1e-12
    assert abs(got["r"] - r) < 1e-12


def test_perfect_and_degenerate(spark):
    # two same-attribute cliques, no cross edges -> r = 1
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    attr = {1: "a", 2: "a", 3: "a", 10: "b", 11: "b", 12: "b"}
    got = attribute_assortativity(edge_df(spark, pairs), _attr_df(spark, attr)).collect()[0]
    assert abs(got["r"] - 1.0) < 1e-12
    # single attribute everywhere -> undefined (NULL)
    attr1 = {k: "a" for k in attr}
    got1 = attribute_assortativity(edge_df(spark, pairs), _attr_df(spark, attr1)).collect()[0]
    assert got1["r"] is None
    # unlabeled endpoints drop: edge (1, 99) ignored
    got2 = attribute_assortativity(
        edge_df(spark, pairs + [(1, 99)]), _attr_df(spark, attr)
    ).collect()[0]
    assert abs(got2["r"] - 1.0) < 1e-12
