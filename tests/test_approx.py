"""Grouped HLL distinct counts: exact replay + accuracy envelope."""

from __future__ import annotations

import math

from linkgraph.approx import approx_distinct
from linkgraph.dedup.phash import P1


def py_mix(v, a, b):
    h = ((a % P1) * (v % P1) + b) % P1
    h = (h * h + (a % P1)) % P1
    return (h * h + (b % P1)) % P1


def py_hll(values, log2m):
    from linkgraph.graph.hyperball import _A2, _B2, _SEED_A, _SEED_B, _alpha

    m = 1 << log2m
    regs = {}
    for v in values:
        j = py_mix(v, _SEED_A, _SEED_B) % m
        w = py_mix(v, _A2, _B2)
        rho = 31 if w == 0 else 31 - len(bin(w)[2:])
        regs[j] = max(regs.get(j, 0), rho)
    inv = sum(1.0 / 2 ** r for r in regs.values()) + (m - len(regs))
    zeros = (m - len(regs)) + sum(1 for r in regs.values() if r == 0)
    raw = _alpha(m) * m * m / inv
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_replay_exact(spark):
    rows = [(k, 1000 * k + (i % (40 * (k + 1))))
            for k in range(3) for i in range(500)]
    df = spark.createDataFrame(rows, "grp int, val long")
    got = {
        r["grp"]: r["n_distinct_est"]
        for r in approx_distinct(df, ["grp"], "val", log2m=6).collect()
    }
    for k in range(3):
        vals = {v for g, v in rows if g == k}
        assert abs(got[k] - py_hll(vals, 6)) < 1e-9, k


def test_accuracy_envelope(spark):
    n = 5000
    df = spark.createDataFrame(
        [(0, i * 7 + 13) for i in range(n)], "grp int, val long"
    )
    est = approx_distinct(df, ["grp"], "val", log2m=8).collect()[0][
        "n_distinct_est"
    ]
    assert abs(est - n) / n < 3 * 1.04 / math.sqrt(256)


def test_string_values_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("a", "y"), ("a", None), ("b", "x")],
        "grp string, val string",
    )
    got = {
        r["grp"]: r["n_distinct_est"]
        for r in approx_distinct(df, ["grp"], "val", log2m=6).collect()
    }
    # tiny cardinalities sit in the linear-counting regime: exact-ish
    assert round(got["a"]) == 2 and round(got["b"]) == 1
