"""Whole-graph summary: complete-graph golden + brute-force parity."""

from __future__ import annotations

import itertools
import random

from linkgraph.graph.summary import graph_summary


def _df(spark, pairs):
    return spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b}),
        "src long, dst long",
    )


def test_k5_summary(spark):
    r = graph_summary(_df(spark, list(itertools.combinations(range(5), 2)))).collect()[0]
    assert (r["n_vertices"], r["n_edges"], r["max_degree"]) == (5, 10, 4)
    assert abs(r["avg_degree"] - 4.0) < 1e-12
    assert abs(r["density"] - 1.0) < 1e-12
    assert (r["n_triangles"], r["n_wedges"]) == (10, 30)
    assert abs(r["transitivity"] - 1.0) < 1e-12


def test_random_summary_matches_brute(spark):
    rng = random.Random(19)
    pairs = {(min(a, b), max(a, b))
             for a, b in ((rng.randrange(25), rng.randrange(25)) for _ in range(90))
             if a != b}
    r = graph_summary(_df(spark, pairs)).collect()[0]
    vs = {v for e in pairs for v in e}
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tri = sum(
        1 for t in itertools.combinations(sorted(vs), 3)
        if all(p in pairs for p in itertools.combinations(t, 2))
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert r["n_vertices"] == len(vs)
    assert r["n_edges"] == len(pairs)
    assert r["max_degree"] == max(deg.values())
    assert r["n_triangles"] == tri
    assert r["n_wedges"] == wedges
    assert abs(r["transitivity"] - (3 * tri / wedges if wedges else 0)) < 1e-12
