"""Co-citation / bibliographic coupling vs brute-force Python."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from linkgraph.graph.cocitation import bibliographic_coupling, co_citation
from tests.conftest import edge_df


def brute(pairs):
    """Return (cocite, couple) dicts keyed by (a,b), a<b, plus degs."""
    pairs = set(pairs)
    out, inn = defaultdict(set), defaultdict(set)
    for s, d in pairs:
        out[s].add(d)
        inn[d].add(s)
    cocite, couple = {}, {}
    nodes = sorted(out.keys() | inn.keys())
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            c = len(inn[a] & inn[b])
            if c:
                cocite[(a, b)] = (c, c / math.sqrt(len(inn[a]) * len(inn[b])))
            k = len(out[a] & out[b])
            if k:
                couple[(a, b)] = (k, k / math.sqrt(len(out[a]) * len(out[b])))
    return cocite, couple


def collect_pairs(df, cnt_col):
    return {
        (r["a"], r["b"]): (r[cnt_col], r["cosine"]) for r in df.collect()
    }


def assert_same(got, want, tol=1e-12):
    assert got.keys() == want.keys()
    for k, (c, cos) in want.items():
        assert got[k][0] == c, (k, got[k], (c, cos))
        assert abs(got[k][1] - cos) <= tol, (k, got[k], (c, cos))


def _golden_fan():
    # 1->{10,11}, 2->{10,11,12}: cocite(10,11)=2 (by 1 and 2),
    # cocite(10,12)=cocite(11,12)=1 (by 2); couple(1,2)=2.
    pairs = [(1, 10), (1, 11), (2, 10), (2, 11), (2, 12)]
    want_cc = {
        (10, 11): (2, 2 / math.sqrt(4)),
        (10, 12): (1, 1 / math.sqrt(2)),
        (11, 12): (1, 1 / math.sqrt(2)),
    }
    want_bc = {(1, 2): (2, 2 / math.sqrt(6))}
    return pairs, want_cc, want_bc


def test_golden_values(spark):
    pairs, want_cc, want_bc = _golden_fan()
    df = edge_df(spark, pairs)
    assert_same(collect_pairs(co_citation(df), "cocitations"), want_cc)
    assert_same(
        collect_pairs(bibliographic_coupling(df), "couplings"), want_bc
    )


def test_random_vs_brute(spark):
    rng = random.Random(7)
    pairs = list({(rng.randrange(30), 100 + rng.randrange(25))
                  for _ in range(150)})
    want_cc, want_bc = brute(pairs)
    df = edge_df(spark, pairs)
    assert_same(collect_pairs(co_citation(df), "cocitations"), want_cc)
    assert_same(
        collect_pairs(bibliographic_coupling(df), "couplings"), want_bc
    )


def test_min_count_and_hub_cap(spark):
    pairs, want_cc, _ = _golden_fan()
    df = edge_df(spark, pairs)
    got = collect_pairs(co_citation(df, min_count=2), "cocitations")
    assert set(got) == {(10, 11)}
    # Cap outdeg<=2 removes source 2 (outdeg 3) before the self-join;
    # only source 1's wedge survives. Cosine still uses TRUE indegrees.
    got = collect_pairs(
        co_citation(df, max_center_degree=2), "cocitations"
    )
    assert set(got) == {(10, 11)}
    assert got[(10, 11)][0] == 1
    assert abs(got[(10, 11)][1] - 1 / math.sqrt(4)) < 1e-12


def test_parallel_edges_deduped(spark):
    # Duplicate edges must not inflate counts or degrees.
    pairs = [(1, 10), (1, 10), (1, 11), (2, 10), (2, 11)]
    df = edge_df(spark, pairs)
    want_cc, want_bc = brute(pairs)
    assert_same(collect_pairs(co_citation(df), "cocitations"), want_cc)
    assert_same(
        collect_pairs(bibliographic_coupling(df), "couplings"), want_bc
    )
