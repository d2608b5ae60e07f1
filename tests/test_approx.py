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


# ---------------------------------------------------------------- quantiles


def py_quantiles(values, qs, nb):
    """Exact replay of approx_quantiles' histogram algebra."""
    import math as _m

    lo, hi, n = float(min(values)), float(max(values)), len(values)
    counts = {}
    for v in values:
        b = 0 if hi == lo else min(nb - 1, int(_m.floor((float(v) - lo) / (hi - lo) * nb)))
        counts[b] = counts.get(b, 0) + 1
    out = {}
    for q in qs:
        r = max(1, _m.ceil(q * n))
        cum = 0
        for b in sorted(counts):
            cum += counts[b]
            if cum >= r:
                if hi == lo:
                    out[q] = (r, lo)
                else:
                    frac = (r - (cum - counts[b])) / counts[b]
                    out[q] = (r, lo + (b + frac) * ((hi - lo) / nb))
                break
    return out


def test_quantiles_replay(spark):
    from linkgraph.approx import approx_quantiles

    vals = [((i * 37) % 101) * 0.5 + (7.0 if i % 3 == 0 else 0.0) for i in range(400)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    got = {
        r["q"]: (r["rank"], r["quantile_est"])
        for r in approx_quantiles(df, "x", qs, n_buckets=64).collect()
    }
    want = py_quantiles(vals, qs, 64)
    assert set(got) == set(want)
    for q in qs:
        assert got[q][0] == want[q][0], q
        assert abs(got[q][1] - want[q][1]) < 1e-12, q


def test_quantiles_exact_on_narrow_int_domain(spark):
    """Integer domain narrower than the bucket count -> exact ranks."""
    from linkgraph.approx import approx_quantiles

    vals = [i % 50 for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    got = {
        r["q"]: r["quantile_est"]
        for r in approx_quantiles(df, "x", [0.5, 0.98], n_buckets=1024).collect()
    }
    s = sorted(vals)
    import math as _m

    for q, est in got.items():
        exact = s[max(1, _m.ceil(q * len(s))) - 1]
        # estimate lands inside the exact value's bucket (width < 0.05)
        assert abs(est - exact) <= 49 / 1024 + 1e-9, (q, est, exact)


def test_quantiles_grouped_and_degenerate(spark):
    from linkgraph.approx import approx_quantiles

    rows = [("a", float(i)) for i in range(100)] + [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "grp string, x double")
    got = {
        (r["grp"], r["q"]): r["quantile_est"]
        for r in approx_quantiles(df, "x", [0.5], ["grp"], n_buckets=32).collect()
    }
    assert abs(got[("a", 0.5)] - py_quantiles([float(i) for i in range(100)], [0.5], 32)[0.5][1]) < 1e-12
    assert got[("b", 0.5)] == 5.0  # degenerate hi == lo group


def test_quantiles_from_streamed_buckets_parity(spark, tmp_path):
    """Streaming bucket counts (availableNow drain) -> read-off equals
    the batch approx_quantiles at the same true bounds."""
    from pyspark.sql import functions as F

    from linkgraph.approx import approx_quantiles, quantiles_from_buckets
    from linkgraph.streaming.jobs import run_available_now
    from linkgraph.streaming.textpipe import streaming_bucket_counts

    vals = [float((i * 53) % 997) for i in range(600)]
    src = tmp_path / "src"
    df = spark.createDataFrame([(v,) for v in vals], "n_chars double")
    df.coalesce(2).write.parquet(str(src))
    lo, hi = min(vals), max(vals)

    from pyspark.sql import types as T

    stream = (
        spark.readStream.schema(T.StructType([T.StructField("n_chars", T.DoubleType())]))
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    counts = streaming_bucket_counts(stream, lo, hi, n_buckets=64)
    run_available_now(
        counts, "qbuckets", str(tmp_path / "ckpt"), output_mode="complete"
    )
    drained = spark.sql("SELECT * FROM qbuckets")
    qs = [0.1, 0.5, 0.95]
    got = {
        r["q"]: (r["rank"], r["quantile_est"])
        for r in quantiles_from_buckets(drained, lo, hi, qs, 64).collect()
    }
    want = {
        r["q"]: (r["rank"], r["quantile_est"])
        for r in approx_quantiles(df, "n_chars", qs, n_buckets=64).collect()
    }
    assert got.keys() == want.keys()
    for q in qs:
        assert got[q][0] == want[q][0], q
        assert abs(got[q][1] - want[q][1]) < 1e-12, q
