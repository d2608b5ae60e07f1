"""Scalar quantization vs numpy replay + error-bound invariants."""

from __future__ import annotations

import math
import random

from linkgraph.sim.quantize import (
    dimension_bounds,
    quantize_embeddings,
    reconstruction_stats,
)


def vecs_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def py_codes(vecs):
    d = len(vecs[0])
    lo = [min(v[j] for v in vecs) for j in range(d)]
    hi = [max(v[j] for v in vecs) for j in range(d)]
    out = []
    for v in vecs:
        cs = []
        for j, x in enumerate(v):
            if hi[j] > lo[j]:
                c = int(
                    math.floor((x - lo[j]) / (hi[j] - lo[j]) * 255 + 0.5)
                )
                cs.append(min(255, max(0, c)))
            else:
                cs.append(0)
        out.append(cs)
    return lo, hi, out


def test_codes_vs_replay(spark):
    rng = random.Random(3)
    vecs = [[rng.uniform(-2, 2) for _ in range(8)] for _ in range(60)]
    vecs.append([0.0] * 8)  # exercise bounds
    lo, hi, want = py_codes(vecs)
    got = {
        r["vec_id"]: list(r["codes"])
        for r in quantize_embeddings(vecs_df(spark, vecs)).collect()
    }
    assert got == {i: want[i] for i in range(len(vecs))}
    gb = {
        r["dim"]: (r["lo"], r["hi"])
        for r in dimension_bounds(vecs_df(spark, vecs)).collect()
    }
    for j in range(8):
        assert abs(gb[j][0] - lo[j]) < 1e-15 and abs(gb[j][1] - hi[j]) < 1e-15


def test_error_bound(spark):
    rng = random.Random(9)
    vecs = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(200)]
    stats = reconstruction_stats(vecs_df(spark, vecs)).collect()
    assert len(stats) == 16
    for r in stats:
        bound = (r["hi"] - r["lo"]) / 510 + 1e-12
        assert r["max_abs_err"] <= bound, (r["dim"], r["max_abs_err"], bound)
        assert r["mse"] <= bound * bound


def test_degenerate_dimension_exact(spark):
    vecs = [[1.0, 5.0], [1.0, 7.0], [1.0, 6.0]]
    stats = {r["dim"]: r for r in reconstruction_stats(vecs_df(spark, vecs)).collect()}
    assert stats[0]["max_abs_err"] == 0.0  # constant dim reconstructs exactly
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in quantize_embeddings(vecs_df(spark, vecs)).collect()
    }
    assert all(c[0] == 0 for c in codes.values())
    assert codes[0][1] == 0 and codes[1][1] == 255


def test_shared_bounds_reuse(spark):
    train = vecs_df(spark, [[0.0, 0.0], [10.0, 1.0]])
    serve = vecs_df(spark, [[5.0, 0.5], [20.0, 2.0]])  # out of range clamps
    b = dimension_bounds(train)
    codes = {
        r["vec_id"]: list(r["codes"])
        for r in quantize_embeddings(serve, bounds=b).collect()
    }
    assert codes[0] == [128, 128]  # floor(0.5*255+0.5)=128
    assert codes[1] == [255, 255]
