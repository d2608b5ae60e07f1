"""Force the at-scale code paths and assert parity with the small-scale
defaults.

The engine switches strategy on size thresholds that small fixtures
never cross: PageRank/LPA broadcast the per-vertex state only while
|V| <= 5M (past it: co-partitioned shuffle join), and the triangle
close join broadcasts the oriented edges only while |E| <= 20M (past
it: shuffled hash join with AQE skew splitting). These are exactly the
paths a 1e9-edge run takes, so each is pinned here by monkeypatching
the threshold to 0 and asserting bit-identical results against the
broadcast-mode run on the same graph.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import linkgraph.graph.labelprop as lpa_mod
import linkgraph.graph.pagerank as pr_mod
import linkgraph.graph.triangles as tri_mod
from tests.conftest import TRUSS_MINI, edge_df

from linkgraph.graph.edges import canonicalize


@pytest.fixture()
def graph(spark):
    return canonicalize(edge_df(spark, TRUSS_MINI))


def _ranks(res):
    return {r["id"]: round(r["rank"], 9) for r in res.ranks.collect()}


def test_pagerank_shuffle_mode_matches_broadcast(spark, graph, monkeypatch):
    small = pr_mod.pagerank(graph, max_iter=15, tol=0.0)
    monkeypatch.setattr(pr_mod, "_BROADCAST_STATE_LIMIT", 0)
    big = pr_mod.pagerank(graph, max_iter=15, tol=0.0)
    assert _ranks(small) == _ranks(big)
    assert abs(sum(_ranks(big).values()) - 1.0) < 1e-9


def test_lpa_shuffle_mode_matches_broadcast(spark, graph, monkeypatch):
    small = lpa_mod.label_propagation(graph, max_iter=10)
    monkeypatch.setattr(lpa_mod, "_BROADCAST_LABELS_LIMIT", 0)
    big = lpa_mod.label_propagation(graph, max_iter=10)
    assert sorted(map(tuple, small.labels.collect())) == sorted(
        map(tuple, big.labels.collect())
    )


def test_triangle_close_shuffle_mode_matches_broadcast(spark, graph, monkeypatch):
    want = sorted(map(tuple, tri_mod.triangles(graph).collect()))
    # Past the broadcast limit but under the SHJ build gate: the close
    # join takes the forced shuffle_hash path.
    monkeypatch.setattr(tri_mod, "_BROADCAST_EDGE_LIMIT", 0)
    for strategy in ("join", "sql", "csr"):
        got = sorted(map(tuple, tri_mod.triangles(graph, strategy=strategy).collect()))
        assert got == want and len(got) == 22
    # Past BOTH gates: the 1e9-edge plan — oriented table repartitioned
    # to a count that bounds the hash build, wedge stream hashed, and no
    # SortMergeJoin anywhere (the wedge side must never be sorted).
    monkeypatch.setattr(tri_mod, "_SHJ_BUILD_ROWS_LIMIT", 0)
    for strategy in ("join", "sql", "csr"):
        tri = tri_mod.triangles(graph, strategy=strategy)
        got = sorted(map(tuple, tri.collect()))
        assert got == want and len(got) == 22
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            tri.explain("formatted")
        assert "SortMergeJoin" not in buf.getvalue(), strategy
