"""HITS vs NumPy power-iteration oracle (allclose 1e-6)."""

from __future__ import annotations

import numpy as np

from linkgraph.graph.hits import hits
from tests.conftest import edge_df, gnp_graph


def numpy_hits(pairs, iters=20):
    """Dense oracle with identical semantics: sequential update
    (auth from hub, then hub from the NEW auth), L2 norm each step."""
    ids = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        na = np.linalg.norm(a)
        a = a / na if na > 0 else a * 0.0
        h = A @ a
        nh = np.linalg.norm(h)
        h = h / nh if nh > 0 else h * 0.0
    return (
        {v: h[idx[v]] for v in ids},
        {v: a[idx[v]] for v in ids},
    )


def scores_dicts(df):
    rows = df.collect()
    return (
        {r["id"]: r["hub"] for r in rows},
        {r["id"]: r["auth"] for r in rows},
    )


def assert_close(got, want, tol=1e-6):
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) <= tol, (k, got[k], want[k])


def test_chain_and_star(spark):
    # 1->2, 1->3, 4->2, 4->3: 1 and 4 are pure hubs, 2 and 3 pure
    # authorities, all symmetric — closed form: hub 1/sqrt(2) each.
    pairs = [(1, 2), (1, 3), (4, 2), (4, 3)]
    res = hits(edge_df(spark, pairs), max_iter=10)
    hub, auth = scores_dicts(res.scores)
    s = 1 / np.sqrt(2)
    assert_close(hub, {1: s, 4: s, 2: 0.0, 3: 0.0})
    assert_close(auth, {1: 0.0, 4: 0.0, 2: s, 3: s})


def test_gnp_vs_oracle(spark):
    df = gnp_graph(spark, n=60, p=0.08, seed=7)
    pairs = [(r["src"], r["dst"]) for r in df.collect()]
    res = hits(df, max_iter=20)
    hub, auth = scores_dicts(res.scores)
    want_h, want_a = numpy_hits(pairs, iters=20)
    assert_close(hub, want_h)
    assert_close(auth, want_a)
    # Both vectors L2-normalized.
    assert abs(sum(v * v for v in hub.values()) - 1.0) < 1e-9
    assert abs(sum(v * v for v in auth.values()) - 1.0) < 1e-9


def test_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    res = hits(empty, max_iter=5)
    assert res.scores.count() == 0
    assert res.iterations == 0


def test_resume_matches_uninterrupted(spark, tmp_path):
    from linkgraph.checkpoint import Checkpointer

    df = gnp_graph(spark, n=40, p=0.1, seed=21)
    full = hits(
        df, max_iter=8,
        checkpointer=Checkpointer(spark, dir=str(tmp_path / "a"), job="hits"),
    )
    ckpt_b = Checkpointer(spark, dir=str(tmp_path / "b"), job="hits")
    hits(df, max_iter=3, checkpointer=ckpt_b)  # "killed" after step 3
    assert ckpt_b.latest() == 3
    resumed = hits(
        df, max_iter=8,
        checkpointer=Checkpointer(spark, dir=str(tmp_path / "b"), job="hits"),
    )
    assert resumed.iterations == 8
    a = {(r["id"]): (r["hub"], r["auth"]) for r in full.scores.collect()}
    b = {(r["id"]): (r["hub"], r["auth"]) for r in resumed.scores.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k]  # bit-identical continuation
