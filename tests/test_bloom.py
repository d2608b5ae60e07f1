"""Bloom pre-filter: NumPy probe parity with the JVM sketch, and
triangle parity with the bloom path forced on.

The probe replicates two public hash algorithms bit-for-bit
(Catalyst xxhash64 over longs; sketch Murmur3_x86_32.hashLong) — the
parity tests here are the contract that keeps the NumPy side honest
against the JVM build side.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import linkgraph.graph.triangles as tri_mod
from linkgraph.bloom import build_long_bloom, parse_bloom_bytes, xxhash64_longs
from tests.conftest import TRUSS_MINI, edge_df

from linkgraph.graph.edges import canonicalize


@pytest.fixture(scope="module")
def pairs(spark):
    rng = np.random.default_rng(11)
    a = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    b = rng.integers(-(2**62), 2**62, 2000, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(a, b)], "a long, b long"
    )
    return a, b, df


def test_xxhash64_matches_jvm(pairs):
    a, b, df = pairs
    jvm = np.array(
        [r[0] for r in df.select(F.xxhash64("a", "b")).collect()], dtype=np.int64
    )
    assert np.array_equal(jvm, xxhash64_longs([a, b]).view(np.int64))
    jvm1 = np.array(
        [r[0] for r in df.select(F.xxhash64("a")).collect()], dtype=np.int64
    )
    assert np.array_equal(jvm1, xxhash64_longs([a]).view(np.int64))


def test_bloom_probe_matches_jvm(pairs):
    a, b, df = pairs
    sk = build_long_bloom(df, ["a", "b"], 2000, 0.01)
    items = xxhash64_longs([a, b])
    # no false negatives, ever
    assert sk.might_contain_longs(items).all()
    # bit-exact agreement with the JVM object on non-members
    jbf = df.select(F.xxhash64("a", "b").alias("k"))._jdf.stat().bloomFilter(
        "k", 2000, 0.01
    )
    rng = np.random.default_rng(12)
    others = xxhash64_longs(
        [
            rng.integers(-(2**62), 2**62, 3000, dtype=np.int64),
            rng.integers(-(2**62), 2**62, 3000, dtype=np.int64),
        ]
    )
    py_mask = sk.might_contain_longs(others)
    jvm_mask = np.array([jbf.mightContainLong(int(np.int64(x))) for x in others])
    assert np.array_equal(py_mask, jvm_mask)
    # fpp in the right ballpark (sized for 1%)
    assert py_mask.mean() < 0.05


def test_parse_rejects_unknown_version():
    with pytest.raises(ValueError):
        parse_bloom_bytes(b"\x00\x00\x00\x63" + b"\x00" * 12)


def test_triangles_bloom_path_parity(spark, monkeypatch):
    graph = canonicalize(edge_df(spark, TRUSS_MINI))
    want = sorted(map(tuple, tri_mod.triangles(graph).collect()))
    assert len(want) == 22
    # Force the bloom gate open (limit 0) at a high fpp so false
    # positives actually occur and must be removed by the close join.
    monkeypatch.setattr(tri_mod, "_BROADCAST_EDGE_LIMIT", 0)
    for strategy in ("join", "sql", "csr"):
        got = sorted(
            map(
                tuple,
                tri_mod.triangles(graph, strategy=strategy, bloom_fpp=0.3).collect(),
            )
        )
        assert got == want, strategy


# ------------------------------------------ blocked Bloom (round 4)


def test_blocked_bloom_no_false_negatives_and_fpp(spark):
    import numpy as np

    from linkgraph import bloom as B
    from linkgraph import mmapshare

    n = 200_000
    df = spark.range(n).selectExpr("id as lo", "id * 7 + 3 as hi")
    state = B.build_blocked_bloom(df, ["lo", "hi"], n, bits_per_key=16)
    lo = np.arange(n, dtype=np.int64)
    hi = lo * 7 + 3
    h = B.xxhash64_longs([lo, hi])
    assert B.blocked_contains(state, h).all()  # zero false negatives
    # disjoint non-keys: measured fpp must be near the design point
    lo2 = np.arange(n, 2 * n, dtype=np.int64)
    hi2 = lo2 * 11 + 5
    h2 = B.xxhash64_longs([lo2, hi2])
    fpp = float(B.blocked_contains(state, h2).mean())
    assert fpp < 0.02, fpp
    mmapshare._CACHE.clear()


def test_blocked_bloom_idx_mask_properties():
    import numpy as np

    from linkgraph.bloom import _BB_K, _bb_idx_mask

    h = np.random.default_rng(7).integers(0, 2**63, size=10_000).astype(
        np.uint64
    )
    idx, mask = _bb_idx_mask(h, 4096)
    assert idx.min() >= 0 and idx.max() < 4096
    # masks have between 1 and K bits set (chunk collisions allowed)
    bits = np.array([bin(int(m)).count("1") for m in mask])
    assert bits.min() >= 1 and bits.max() <= _BB_K
    # deterministic
    idx2, mask2 = _bb_idx_mask(h, 4096)
    assert (idx == idx2).all() and (mask == mask2).all()


def test_stage_array_content_addressed_reuse(spark):
    """Round-5 mmapshare change: staging identical content twice
    returns the same name without accruing staged bytes; different
    content stages fresh."""
    import numpy as np

    from linkgraph import mmapshare

    a = np.arange(1000, dtype=np.int64).reshape(2, 500)
    before = mmapshare.staged_bytes()
    n1 = mmapshare.stage_array(spark.sparkContext, a, prefix="t_reuse")
    mid = mmapshare.staged_bytes()
    n2 = mmapshare.stage_array(spark.sparkContext, a.copy(), prefix="t_reuse")
    assert n1 == n2
    assert mmapshare.staged_bytes() == mid == before + a.nbytes
    b = a + 1
    n3 = mmapshare.stage_array(spark.sparkContext, b, prefix="t_reuse")
    assert n3 != n1
    assert mmapshare.staged_bytes() == mid + b.nbytes
    # empty arrays stage without error (memoryview cast edge case)
    e = np.empty((3, 0), dtype=np.int64)
    n4 = mmapshare.stage_array(spark.sparkContext, e, prefix="t_reuse")
    assert n4 != n3
