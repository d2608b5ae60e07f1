"""DSIR importance resampling vs an exact python replay."""

from __future__ import annotations

import math

import pytest

from linkgraph.sampling import _BUCKETS, MIX_C1, MIX_C2
from linkgraph.dedup.phash import P1
from linkgraph.text.dsir import importance_resample, importance_weights


def _poly(s: str, mult: int = 31, mod: int = P1) -> int:
    h = 0
    for ch in s:
        h = (h * mult + ord(ch)) % mod
    return h


def _mix(h: int) -> int:
    h = (h * h + MIX_C1) % P1
    return (h * h + MIX_C2) % P1


def _grams(text: str) -> list[str]:
    ws = text.strip().lower().split()
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def brute_weights(raw, target, n_buckets=32):
    def tf_by_bucket(docs):
        out = {}
        for i, t in docs:
            d = out.setdefault(i, {})
            for g in _grams(t):
                b = _mix(_poly(g)) % n_buckets
                d[b] = d.get(b, 0) + 1
        return out

    rtf, ttf = tf_by_bucket(raw), tf_by_bucket(target)
    q, p = {}, {}
    for d in rtf.values():
        for b, c in d.items():
            q[b] = q.get(b, 0) + c
    for d in ttf.values():
        for b, c in d.items():
            p[b] = p.get(b, 0) + c
    q_tot, p_tot = float(sum(q.values())), float(sum(p.values()))
    out = {}
    for i, d in rtf.items():
        logw = sum(
            c
            * math.log(
                ((p.get(b, 0) + 1.0) / (p_tot + n_buckets))
                / ((q.get(b, 0) + 1.0) / (q_tot + n_buckets))
            )
            for b, c in d.items()
        )
        out[i] = (sum(d.values()), logw)
    return out


def df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


RAW = [
    (0, "alpha beta gamma alpha"),
    (1, "delta epsilon zeta"),
    (2, "alpha alpha beta beta"),
    (3, "eta theta iota kappa"),
    (4, "alpha beta"),
    (5, "zzz yyy xxx www"),
]
TARGET = [
    (100, "alpha beta gamma delta alpha beta"),
    (101, "alpha gamma beta alpha"),
]


def test_weights_match_brute(spark):
    got = {
        r["doc_id"]: (r["n_grams"], r["logw"])
        for r in importance_weights(
            df(spark, RAW), df(spark, TARGET), n_buckets=32, portable=True
        ).collect()
    }
    want = brute_weights(RAW, TARGET, n_buckets=32)
    assert got.keys() == want.keys()
    for k, (n, lw) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(lw, abs=1e-10)


def test_resample_deterministic_and_sized(spark):
    a = importance_resample(
        df(spark, RAW), df(spark, TARGET), k=3, n_buckets=32, portable=True
    ).collect()
    b = importance_resample(
        df(spark, RAW).repartition(7),
        df(spark, TARGET),
        k=3,
        n_buckets=32,
        portable=True,
    ).collect()
    sel_a = sorted(r["doc_id"] for r in a if r["selected"])
    sel_b = sorted(r["doc_id"] for r in b if r["selected"])
    assert sel_a == sel_b and len(sel_a) == 3
    assert len(a) == len(RAW)


def test_resample_prefers_target_like_docs(spark):
    # Planted: target speaks vocab A; raw has 10 A-docs and 10 B-docs.
    # With strongly separated weights the Gumbel-top-5 must be all A.
    a_rows = [(i, "alpha beta gamma delta " * 5) for i in range(10)]
    b_rows = [(100 + i, "zonk quux blorp frob " * 5) for i in range(10)]
    tgt = [(900 + i, "alpha beta gamma delta alpha beta") for i in range(5)]
    got = importance_resample(
        df(spark, a_rows + b_rows), df(spark, tgt), k=5,
        n_buckets=64, portable=True,
    ).collect()
    sel = [r["doc_id"] for r in got if r["selected"]]
    assert len(sel) == 5
    assert all(i < 100 for i in sel)
