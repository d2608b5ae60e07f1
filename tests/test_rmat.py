"""R-MAT generator: exact Python replay, determinism, skew shape."""

from __future__ import annotations

from collections import Counter

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B
from linkgraph.ingest.rmat import rmat_edges


def py_rmat(scale, n_edges, a, b, c, seed):
    out = []
    for i in range(n_edges):
        src = dst = 0
        for lvl in range(scale):
            x = (i * 1_000_003 + lvl * 7_368_787 + seed) % P1
            x = (_SEED_A * x + _SEED_B) % P1
            x = (x * x + lvl + 1) % P1
            x = (_SEED_A * x + _SEED_B) % P1
            x = (x * x + i) % P1
            u = x / P1
            src_bit = 1 if u >= a + b else 0
            dst_bit = 1 if (a <= u < a + b) or (u >= a + b + c) else 0
            src = src * 2 + src_bit
            dst = dst * 2 + dst_bit
        out.append((i, src, dst))
    return out


def test_exact_replay(spark):
    scale, n = 6, 300
    got = sorted(
        (r["src"], r["dst"])
        for r in rmat_edges(spark, scale=scale, n_edges=n).collect()
    )
    want = sorted((s, d) for _, s, d in py_rmat(scale, n, 0.57, 0.19, 0.19, 42))
    assert got == want
    assert all(0 <= s < 64 and 0 <= d < 64 for s, d in got)


def test_deterministic_across_partitionings(spark):
    df1 = rmat_edges(spark, scale=8, n_edges=500).repartition(7)
    df2 = rmat_edges(spark, scale=8, n_edges=500).coalesce(1)
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))


def test_seed_changes_graph(spark):
    g1 = set(map(tuple, rmat_edges(spark, scale=8, n_edges=400, seed=1).collect()))
    g2 = set(map(tuple, rmat_edges(spark, scale=8, n_edges=400, seed=2).collect()))
    assert g1 != g2


def test_draw_quality_matches_true_rng(spark):
    # The hash draw must not collapse the graph: distinct-edge and
    # distinct-source counts within 2% of a true-RNG R-MAT run.
    import random

    rows = rmat_edges(spark, scale=12, n_edges=20_000).collect()
    got_e = len({(r["src"], r["dst"]) for r in rows})
    got_s = len({r["src"] for r in rows})
    rng = random.Random(0)
    ref = []
    for _ in range(20_000):
        src = dst = 0
        for _ in range(12):
            u = rng.random()
            src = src * 2 + (1 if u >= 0.76 else 0)
            dst = dst * 2 + (1 if (0.57 <= u < 0.76) or u >= 0.95 else 0)
        ref.append((src, dst))
    ref_e, ref_s = len(set(ref)), len({s for s, _ in ref})
    assert abs(got_e - ref_e) / ref_e < 0.02, (got_e, ref_e)
    assert abs(got_s - ref_s) / ref_s < 0.02, (got_s, ref_s)


def test_degree_skew(spark):
    # R-MAT with (0.57,.19,.19) concentrates mass in low quadrants: the
    # max out-degree must far exceed the mean (power-law-ish head), and
    # uniform (a=b=c=0.25) must not.
    rows = rmat_edges(spark, scale=10, n_edges=8192).collect()
    deg = Counter(r["src"] for r in rows)
    mean = 8192 / 1024
    assert max(deg.values()) > 6 * mean
    uni = rmat_edges(
        spark, scale=10, n_edges=8192, a=0.25, b=0.25, c=0.25
    ).collect()
    udeg = Counter(r["src"] for r in uni)
    assert max(udeg.values()) < max(deg.values())
