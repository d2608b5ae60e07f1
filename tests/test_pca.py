"""Distributed PCA: covariance vs numpy, power-iteration replay,
projection vs exact eigensolve, and the sign-fix convention."""

from __future__ import annotations

import random

import numpy as np

from linkgraph.sim.pca import (
    embedding_covariance,
    pca_project,
    pca_top_component,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )


def _rand_vecs(seed, n=60, d=6):
    rng = random.Random(seed)
    return {i: [rng.gauss(0, 1) + (i % 3) for _ in range(d)] for i in range(n)}


def test_covariance_matches_numpy(spark):
    vecs = _rand_vecs(7)
    X = np.array([vecs[i] for i in sorted(vecs)])
    want = np.cov(X, rowvar=False)  # sample covariance (ddof=1)
    got = embedding_covariance(_emb_df(spark, vecs)).collect()
    assert len(got) == 6 * 7 // 2
    for r in got:
        assert r["i"] <= r["j"]
        assert abs(r["cov"] - want[r["i"], r["j"]]) < 1e-9


def test_top_component_matches_power_iteration_replay(spark):
    vecs = _rand_vecs(11, n=80, d=5)
    X = np.array([vecs[i] for i in sorted(vecs)])
    C = np.cov(X, rowvar=False)
    v = np.full(5, 1.0 / np.sqrt(5))
    for _ in range(3):
        v = C @ v
        v = v / np.sqrt(v @ v)
    k = int(np.argmax(np.abs(v)))
    if v[k] < 0:
        v = -v
    got = {r["dim"]: r["loading"]
           for r in pca_top_component(_emb_df(spark, vecs), n_rounds=3).collect()}
    assert all(abs(got[i] - v[i]) < 1e-9 for i in range(5))


def test_projection_matches_eigh(spark):
    vecs = _rand_vecs(3, n=50, d=4)
    X = np.array([vecs[i] for i in sorted(vecs)])
    C = np.cov(X, rowvar=False)
    w, V = np.linalg.eigh(C)
    comps = []
    for i in range(2):
        c = V[:, -1 - i]
        k = int(np.argmax(np.abs(c)))
        comps.append(-c if c[k] < 0 else c)
    mu = X.mean(axis=0)
    want = (X - mu) @ np.array(comps).T
    got = {r["id"]: r["proj"]
           for r in pca_project(_emb_df(spark, vecs), k=2).collect()}
    for rank, vid in enumerate(sorted(vecs)):
        assert np.allclose(got[vid], want[rank], atol=1e-8)


def test_projection_uncentered(spark):
    vecs = _rand_vecs(5, n=40, d=4)
    X = np.array([vecs[i] for i in sorted(vecs)])
    got = {r["id"]: r["proj"]
           for r in pca_project(_emb_df(spark, vecs), k=1, center=False).collect()}
    C = np.cov(X, rowvar=False)
    _, V = np.linalg.eigh(C)
    c = V[:, -1]
    k = int(np.argmax(np.abs(c)))
    c = -c if c[k] < 0 else c
    want = X @ c
    for rank, vid in enumerate(sorted(vecs)):
        assert abs(got[vid][0] - want[rank]) < 1e-8


def test_top_component_sign_positive_at_peak(spark):
    vecs = _rand_vecs(13, n=70, d=6)
    got = [r["loading"]
           for r in pca_top_component(_emb_df(spark, vecs), n_rounds=4)
           .orderBy("dim").collect()]
    peak = max(range(6), key=lambda i: abs(got[i]))
    assert got[peak] > 0
    assert abs(np.linalg.norm(got) - 1.0) < 1e-9
