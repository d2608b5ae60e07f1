"""Local sparsification vs brute-force Python replay."""

from __future__ import annotations

import math
import random
from collections import defaultdict

from linkgraph.graph.sparsify import edge_jaccard, sparsify
from tests.conftest import edge_df


def brute_jaccard(pairs):
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    out = {}
    for a, b in pairs:
        c = len(nbrs[a] & nbrs[b])
        out[(a, b)] = (c, c / len(nbrs[a] | nbrs[b]))
    return out, nbrs


def brute_sparsify(pairs, e):
    sim, nbrs = brute_jaccard(pairs)
    keep = set()
    incident = defaultdict(list)
    for (a, b), (c, j) in sim.items():
        incident[a].append((-j, b, (a, b)))
        incident[b].append((-j, a, (a, b)))
    for v, lst in incident.items():
        lst.sort()
        for rank, (_, _, edge) in enumerate(lst, start=1):
            if rank <= math.ceil(len(nbrs[v]) ** e):
                keep.add(edge)
    return keep, sim


def canon(pairs):
    return [(min(a, b), max(a, b)) for a, b in pairs]


def test_jaccard_triangle_plus_tail(spark):
    # Triangle 1-2-3 plus pendant 3-4: edge (1,2) has common nbr 3,
    # union {2,3}∪{1,3}={1,2,3} -> 1/3; pendant edge has 0.
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4)]
    got = {
        (r["src"], r["dst"]): (r["common"], r["jaccard"])
        for r in edge_jaccard(edge_df(spark, pairs)).collect()
    }
    want, _ = brute_jaccard(canon(pairs))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12


def test_random_vs_brute(spark):
    rng = random.Random(13)
    pairs = canon(
        {(rng.randrange(40), rng.randrange(40)) for _ in range(200)}
    )
    pairs = [(a, b) for a, b in set(pairs) if a != b]
    df = edge_df(spark, pairs)
    want, _ = brute_jaccard(pairs)
    got = {
        (r["src"], r["dst"]): (r["common"], r["jaccard"])
        for r in edge_jaccard(df).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12
    for e in (0.3, 0.5, 0.8):
        keep, _ = brute_sparsify(pairs, e)
        got_keep = {
            (r["src"], r["dst"]) for r in sparsify(df, e=e).collect()
        }
        assert got_keep == keep, e


def test_e_one_keeps_everything(spark):
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    df = edge_df(spark, pairs)
    kept = {(r["src"], r["dst"]) for r in sparsify(df, e=1.0).collect()}
    assert kept == set(canon(pairs))


def test_hub_sparsifies_superlinearly(spark):
    # Star K1,20 with a clique among 4 leaves: clique edges rank high
    # at both endpoints; the hub keeps only ceil(20^0.5)=5 edges.
    pairs = [(0, i) for i in range(1, 21)] + [
        (1, 2), (1, 3), (2, 3), (1, 4), (2, 4), (3, 4)
    ]
    keep, _ = brute_sparsify(canon(pairs), 0.5)
    got = {
        (r["src"], r["dst"])
        for r in sparsify(edge_df(spark, pairs), e=0.5).collect()
    }
    assert got == keep
    assert len(got) < len(pairs)
