"""HyperBall: exact sketch replay, convergence at diameter, estimate
quality, and the distance-distribution/effective-diameter derivations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B
from linkgraph.graph.hyperball import (
    _A2,
    _B2,
    _alpha,
    distance_distribution,
    effective_diameter,
    hyperball,
)
from tests.conftest import edge_df, gnp_graph, path_graph, star_graph


def _py_mix(v: int, a: int, b: int) -> int:
    h = ((a % P1) * (v % P1) + b) % P1
    h = (h * h + a % P1) % P1
    return (h * h + b % P1) % P1


def _py_reg(v: int, m: int) -> int:
    return _py_mix(v, _SEED_A, _SEED_B) % m


def _py_rho(v: int) -> int:
    w = _py_mix(v, _A2, _B2)
    return 31 if w == 0 else 31 - w.bit_length()


def _py_balls(pairs, t):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    balls = {v: {v} for v in adj}
    for _ in range(t):
        balls = {
            v: set().union(cur, *(balls[w] for w in adj[v]))
            for v, cur in balls.items()
        }
    return balls


def _py_est(ball, m):
    regs = [0] * m
    for u in ball:
        j = _py_reg(u, m)
        regs[j] = max(regs[j], _py_rho(u))
    inv = sum(2.0 ** -r for r in regs)
    zeros = regs.count(0)
    raw = _alpha(m) * m * m / inv
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_sketch_matches_python_replay_exactly(spark):
    pairs = [
        (r["src"], r["dst"]) for r in gnp_graph(spark, n=40, p=0.08, seed=5).collect()
    ]
    g = edge_df(spark, pairs)
    res = hyperball(g, max_t=2, log2m=4, until_convergence=False)
    got = {
        (r["id"], r["t"]): r["est"] for r in res.balls.collect()
    }
    balls = {0: _py_balls(pairs, 0), 1: _py_balls(pairs, 1), 2: _py_balls(pairs, 2)}
    for (v, t), est in got.items():
        assert abs(est - _py_est(balls[t][v], 16)) < 1e-9, (v, t)


def test_converges_at_diameter(spark):
    g = path_graph(spark, 6)  # P6: diameter 5
    res = hyperball(g, max_t=20, log2m=4)
    assert res.converged
    # no-change detected one round past the diameter
    assert res.rounds == 6


def test_estimate_quality_large_m(spark):
    # one 60-clique: ball(1) is all 60 vertices; m=64 + linear counting
    # keeps small-range estimates within a few percent
    from tests.conftest import complete_graph

    g = complete_graph(spark, 60)
    res = hyperball(g, max_t=1, log2m=6, until_convergence=False)
    ests = [r["est"] for r in res.balls.where(F.col("t") == 1).collect()]
    assert all(abs(e - 60) / 60 < 0.3 for e in ests)


def test_distance_distribution_monotone_and_effective_diameter(spark):
    g = star_graph(spark, 8)
    res = hyperball(g, max_t=10, log2m=6)
    dist = distance_distribution(res.balls).collect()
    vals = [r["reachable_pairs_est"] for r in dist]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    # star: every pair within distance 2
    assert effective_diameter(res.balls, q=0.99) <= 2.0
