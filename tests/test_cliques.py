"""4-clique enumeration: complete-graph goldens, near-miss cases, and
random-graph parity with an itertools brute force."""

from __future__ import annotations

import itertools
import random

from linkgraph.graph.cliques import (
    four_clique_count,
    four_cliques,
    vertex_four_clique_count,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b}),
        "src long, dst long",
    )


def _complete(n):
    return list(itertools.combinations(range(n), 2))


def _brute(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    vs = sorted({v for e in es for v in e})
    out = set()
    for quad in itertools.combinations(vs, 4):
        if all(p in es for p in itertools.combinations(quad, 2)):
            out.add(quad)
    return out


def test_k4_is_one_clique(spark):
    got = four_cliques(_df(spark, _complete(4))).collect()
    assert [(r["a"], r["b"], r["c"], r["d"]) for r in got] == [(0, 1, 2, 3)]


def test_k5_has_five_cliques(spark):
    got = {(r["a"], r["b"], r["c"], r["d"])
           for r in four_cliques(_df(spark, _complete(5))).collect()}
    assert got == set(itertools.combinations(range(5), 4))


def test_k5_minus_edge(spark):
    pairs = [p for p in _complete(5) if p != (0, 1)]
    got = {(r["a"], r["b"], r["c"], r["d"])
           for r in four_cliques(_df(spark, pairs)).collect()}
    assert got == {(0, 2, 3, 4), (1, 2, 3, 4)}


def test_square_has_no_clique(spark):
    assert four_clique_count(_df(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])) == 0


def test_random_graph_matches_brute_force(spark):
    rng = random.Random(23)
    pairs = [(rng.randrange(30), rng.randrange(30)) for _ in range(260)]
    df = _df(spark, pairs)
    got = {(r["a"], r["b"], r["c"], r["d"]) for r in four_cliques(df).collect()}
    want = _brute(pairs)
    assert len(want) > 3  # the seed must actually exercise the operator
    assert got == want


def test_vertex_counts(spark):
    pairs = [p for p in _complete(5) if p != (0, 1)]
    k4 = four_cliques(_df(spark, pairs))
    got = {r["id"]: r["n_cliques"]
           for r in vertex_four_clique_count(k4).collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 2}
