"""PSI/KL drift vs a Python replay."""

from __future__ import annotations

import math
import random

from linkgraph.text.drift import distribution_drift, drift_summary

EPS = 1e-6


def py_drift(ref, cur, n):
    lo, hi = min(ref), max(ref)

    def bucket(x):
        if hi <= lo:
            return 0
        return min(n - 1, max(0, int(math.floor((x - lo) / (hi - lo) * n))))

    nr = [0] * n
    nc = [0] * n
    for x in ref:
        nr[bucket(x)] += 1
    for x in cur:
        nc[bucket(x)] += 1
    tr, tc = sum(nr), sum(nc)
    out = {}
    for i in range(n):
        p = (nr[i] + EPS) / (tr + n * EPS)
        q = (nc[i] + EPS) / (tc + n * EPS)
        out[i] = (nr[i], nc[i], p, q, (p - q) * math.log(p / q),
                  p * math.log(p / q))
    return out


def vals_df(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_identical_slices_no_drift(spark):
    xs = [1, 2, 2, 3, 5, 8, 13]
    r = drift_summary(vals_df(spark, xs), vals_df(spark, xs), "v").collect()[0]
    assert abs(r["psi"]) < 1e-12 and abs(r["kl"]) < 1e-12


def test_shifted_slice_drifts(spark):
    rng = random.Random(1)
    ref = [rng.gauss(0, 1) for _ in range(400)]
    cur = [rng.gauss(2, 1) for _ in range(400)]
    r = drift_summary(vals_df(spark, ref), vals_df(spark, cur), "v").collect()[0]
    assert r["psi"] > 0.25  # clearly shifted


def test_terms_vs_replay(spark):
    rng = random.Random(7)
    ref = [rng.uniform(0, 10) for _ in range(150)]
    cur = [rng.uniform(3, 15) for _ in range(130)]  # out-of-range clamps
    got = {
        r["bucket"]: (
            r["n_ref"], r["n_cur"], r["p_ref"], r["p_cur"],
            r["psi_term"], r["kl_term"],
        )
        for r in distribution_drift(
            vals_df(spark, ref), vals_df(spark, cur), "v", n_buckets=8
        ).collect()
    }
    want = py_drift(ref, cur, 8)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0] and got[k][1] == want[k][1]
        for gi, wi in zip(got[k][2:], want[k][2:]):
            assert abs(gi - wi) < 1e-12, k


def test_degenerate_reference(spark):
    # Constant reference: everything lands in bucket 0, PSI finite.
    r = distribution_drift(
        vals_df(spark, [5, 5, 5]), vals_df(spark, [5, 7]), "v", n_buckets=4
    ).collect()
    by = {x["bucket"]: x for x in r}
    assert by[0]["n_ref"] == 3 and by[0]["n_cur"] == 2
    assert all(by[i]["n_ref"] == 0 for i in (1, 2, 3))
