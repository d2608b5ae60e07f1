"""Fiedler vector vs a NumPy replay + spectral ground truth."""

from __future__ import annotations

import numpy as np

from linkgraph.dedup.phash import P1, _SEED_A, _SEED_B
from linkgraph.graph.fiedler import fiedler, spectral_bisection
from tests.conftest import edge_df


def numpy_fiedler(pairs, iters):
    """Identical recursion: shift c = maxdeg+1, hash init, center+norm."""
    ids = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    d = A.sum(axis=1)
    c = d.max() + 1

    def init(v):
        h = (_SEED_A * (v % P1) + _SEED_B) % P1
        h2 = (h * h + _SEED_B) % P1
        return h2 / P1 - 0.5

    x = np.array([init(v) for v in ids])

    def cn(y):
        y = y - y.mean()
        nr = np.sqrt((y * y).sum())
        return y / nr if nr > 0 else y * 0.0

    x = cn(x)
    for _ in range(iters):
        x = cn((c - d) * x + A @ x)
    return {v: x[idx[v]] for v in ids}


def scores(df):
    return {r["id"]: r["fiedler"] for r in df.collect()}


def test_replay_exact(spark):
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (3, 5)]
    got = scores(fiedler(edge_df(spark, pairs), max_iter=12).scores)
    want = numpy_fiedler(pairs, 12)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, k


def test_two_cliques_bridge_bisection(spark):
    # Two K4s joined by one edge: the spectral cut is the bridge.
    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = k1 + k2 + [(3, 10)]
    side = {
        r["id"]: r["side"]
        for r in spectral_bisection(edge_df(spark, pairs), max_iter=20).collect()
    }
    assert len({side[v] for v in range(4)}) == 1
    assert len({side[v] for v in range(10, 14)}) == 1
    assert side[0] != side[10]


def test_path_graph_matches_eigensolver(spark):
    # P6: Fiedler vector is known analytically (cosine profile); check
    # against numpy.linalg.eigh up to sign after enough rounds.
    pairs = [(i, i + 1) for i in range(5)]
    got = scores(fiedler(edge_df(spark, pairs), max_iter=60).scores)
    ids = sorted(got)
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = A[b, a] = 1.0
    L = np.diag(A.sum(1)) - A
    w, v = np.linalg.eigh(L)
    f = v[:, 1]
    g = np.array([got[i] for i in ids])
    if np.sign(g[0]) != np.sign(f[0]):
        f = -f
    assert np.abs(g - f).max() < 1e-6
    # monotone along the path (the classic P_n Fiedler profile)
    assert all(np.diff(g) > 0) or all(np.diff(g) < 0)


def test_resume_matches_uninterrupted(spark, tmp_path):
    from linkgraph.checkpoint import Checkpointer
    from tests.conftest import gnp_graph

    df = gnp_graph(spark, n=40, p=0.1, seed=21)
    full = fiedler(
        df, max_iter=8,
        checkpointer=Checkpointer(spark, dir=str(tmp_path / "a"), job="fied"),
    )
    ckpt_b = Checkpointer(spark, dir=str(tmp_path / "b"), job="fied")
    fiedler(df, max_iter=3, checkpointer=ckpt_b)  # "killed" after step 3
    assert ckpt_b.latest() == 3
    resumed = fiedler(
        df, max_iter=8,
        checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="fied"),
    )
    assert resumed.iterations == 8
    a = {r["id"]: r["fiedler"] for r in full.scores.collect()}
    b = {r["id"]: r["fiedler"] for r in resumed.scores.collect()}
    assert a == b  # bit-identical continuation


def test_spectral_sweep_vs_brute(spark):
    from linkgraph.graph.fiedler import spectral_sweep

    k1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    pairs = k1 + k2 + [(3, 10)]
    rows = spectral_sweep(edge_df(spark, pairs), max_iter=20).collect()

    # brute replay from the engine's own fiedler values (ordering
    # contract), cut/vol recomputed independently in python
    order = sorted(rows, key=lambda r: (r["fiedler"], r["id"]))
    assert [r["pos"] for r in order] == list(range(1, len(rows) + 1))
    import collections

    deg = collections.Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    total = sum(deg.values())
    inset = set()
    for want_pos, r in enumerate(order, start=1):
        inset.add(r["id"])
        vol = sum(deg[v] for v in inset)
        cut = sum(1 for a, b in pairs if (a in inset) != (b in inset))
        assert r["volume"] == vol, r
        assert r["cut_edges"] == cut, r
        den = min(vol, total - vol)
        if den > 0:
            assert abs(r["conductance"] - cut / den) < 1e-12
        else:
            assert r["conductance"] is None
    # the minimum-conductance prefix is one whole clique: the bridge
    best = min(
        (r for r in rows if r["conductance"] is not None),
        key=lambda r: (r["conductance"], r["pos"]),
    )
    assert best["pos"] == 4 and abs(best["conductance"] - 1 / 13) < 1e-12
