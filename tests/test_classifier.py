"""Trained logistic quality classifier vs an exact numpy GD replay."""

from __future__ import annotations

import math

import numpy as np
import pytest

from linkgraph.text.classifier import (
    logistic_scores,
    quality_features_for_lr,
    train_logistic,
)


def labeled_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


DOCS = [
    (0, "the cat sat on the mat", 1),
    (1, "the dog sat on the log today", 1),
    (2, "zqx qzk vvw zqx zqx", 0),
    (3, "aaaaaaaaaaaa bbbbbbbbbbbb cccc", 0),
    (4, "a quick brown fox jumps over the lazy dog", 1),
    (5, "x y z x y z x y z x y z", 0),
    (6, "   ", 0),  # empty after trim: dropped from features
]


def brute_features(rows):
    feats = {}
    for doc_id, text, y in rows:
        ws = text.strip().lower().split()
        if not ws:
            continue
        n = len(ws)
        feats[doc_id] = (
            y,
            n / 100.0,
            sum(len(w) for w in ws) / n,
            len(set(ws)) / n,
        )
    return feats


def brute_gd(feats, rounds=3, lr=0.5):
    ids = sorted(feats)
    y = np.array([feats[i][0] for i in ids], dtype=float)
    x = np.array([[1.0, *feats[i][1:]] for i in ids])
    w = np.zeros(x.shape[1])
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        w = w - lr * (x.T @ (p - y)) / len(ids)
    scores = 1.0 / (1.0 + np.exp(-(x @ w)))
    return w, dict(zip(ids, scores))


def test_features_match_brute(spark):
    got = {
        r["doc_id"]: (r["y"], r["x1"], r["x2"], r["x3"])
        for r in quality_features_for_lr(
            labeled_df(spark, DOCS), keep=("y",)
        ).collect()
    }
    want = brute_features(DOCS)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_training_matches_numpy_replay(spark):
    feats = quality_features_for_lr(labeled_df(spark, DOCS), keep=("y",))
    w = train_logistic(feats, rounds=3, lr=0.5)
    want_w, want_scores = brute_gd(brute_features(DOCS))
    assert w == pytest.approx(list(want_w), abs=1e-12)
    got = {
        r["doc_id"]: r["score"]
        for r in logistic_scores(feats, w).collect()
    }
    assert got.keys() == want_scores.keys()
    for k, s in want_scores.items():
        assert got[k] == pytest.approx(s, abs=1e-12)
        assert 0.0 < got[k] < 1.0


def test_learns_separable_labels(spark):
    # Long-token docs labeled 1, short-token docs labeled 0: x2 (mean
    # token length) separates them linearly, so enough rounds must
    # order every positive above every negative.
    rows = []
    for i in range(20):
        rows.append((i, " ".join(["abcdefgh"] * (5 + i % 3)), 1))
        rows.append((100 + i, " ".join(["ab"] * (5 + i % 3)), 0))
    feats = quality_features_for_lr(labeled_df(spark, rows), keep=("y",))
    feats = feats.persist()
    try:
        w = train_logistic(feats, rounds=50, lr=0.5)
        scored = logistic_scores(feats, w).collect()
    finally:
        feats.unpersist()
    pos = [r["score"] for r in scored if r["y"] == 1]
    neg = [r["score"] for r in scored if r["y"] == 0]
    assert min(pos) > max(neg)
    assert all(math.isfinite(v) for v in w)
