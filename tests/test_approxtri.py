"""DOULION approximate triangle count: exact Python coin replay,
p=1 degeneracy to the exact count, determinism, and estimator accuracy
on a planted dense graph (all deterministic — the coin is a hash)."""

from __future__ import annotations

import itertools
import random

from conftest import edge_df

from linkgraph.dedup.phash import P1
from linkgraph.graph.approxtri import approx_triangle_count, sample_edges


def _coin(src, dst, seed, den, num):
    a = (2_654_435_761 * (seed + 1)) % P1 or 1
    h0 = ((src % P1) * 1_000_003 + dst % P1 + a) % P1
    return (h0 * h0 + a) % P1 % den < num


def _py_triangles(pairs):
    s = set(pairs)
    adj = {}
    for a, b in s:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return sum(
        1
        for a in adj
        for b, c in itertools.combinations(sorted(x for x in adj[a] if x > a), 2)
        if (b, c) in s
    )


def test_sample_matches_coin_replay(spark):
    rng = random.Random(3)
    pairs = sorted({tuple(sorted(rng.sample(range(100), 2))) for _ in range(400)})
    got = {
        (r["src"], r["dst"])
        for r in sample_edges(edge_df(spark, pairs), num=1, den=3, seed=5).collect()
    }
    want = {p for p in pairs if _coin(*p, seed=5, den=3, num=1)}
    assert got == want
    assert 0 < len(got) < len(pairs)


def test_p_one_is_exact(spark, truss_mini):
    from conftest import TRUSS_MINI

    row = approx_triangle_count(truss_mini, num=1, den=1).collect()[0]
    true = _py_triangles(sorted({tuple(sorted(p)) for p in TRUSS_MINI}))
    assert row["sampled_triangles"] == row["est_triangles"] == true == 22


def test_deterministic_and_seed_sensitive(spark):
    rng = random.Random(7)
    pairs = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(300)})
    df = edge_df(spark, pairs)
    a = approx_triangle_count(df, num=1, den=2, seed=1).collect()[0]
    b = approx_triangle_count(df, num=1, den=2, seed=1).collect()[0]
    assert a == b
    edges1 = sample_edges(df, num=1, den=2, seed=1).count()
    edges2 = sample_edges(df, num=1, den=2, seed=2).count()
    assert edges1 != edges2  # different coins, overwhelmingly


def test_estimate_accuracy_dense(spark):
    """p=1/2 on a triangle-rich graph: deterministic, and the estimate
    lands within 35% of truth (DOULION concentration at ~1.3k true
    triangles; checked against the Python replay, not luck)."""
    rng = random.Random(19)
    pairs = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(420)})
    true = _py_triangles(pairs)
    assert true > 500
    row = approx_triangle_count(edge_df(spark, pairs), num=1, den=2, seed=1).collect()[0]
    kept = [p for p in pairs if _coin(*p, seed=1, den=2, num=1)]
    assert row["sampled_triangles"] == _py_triangles(kept)
    assert row["est_triangles"] == row["sampled_triangles"] * 8.0
    assert abs(row["est_triangles"] - true) / true < 0.35
