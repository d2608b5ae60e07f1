"""Bipartite projection + similarity, cross-corpus exact dedup, and
per-group budget selection — brute-force / hand-computed parity."""

from __future__ import annotations

import itertools
import math
import random

from linkgraph.dedup.exact import deduplicate_against
from linkgraph.graph.projection import (
    cooccurrence_similarity,
    weighted_projection,
)
from linkgraph.sampling import budget_select


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket long, item long")


def _brute_pairs(rows, cap=None):
    members: dict[int, set] = {}
    for b, i in rows:
        members.setdefault(b, set()).add(i)
    if cap is not None:
        members = {b: s for b, s in members.items() if len(s) <= cap}
    counts: dict[tuple, int] = {}
    for s in members.values():
        for a, b in itertools.combinations(sorted(s), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    deg: dict[int, int] = {}
    for s in members.values():
        for i in s:
            deg[i] = deg.get(i, 0) + 1
    return counts, deg, len(members)


def test_projection_matches_brute_force(spark):
    rng = random.Random(31)
    rows = list({(rng.randrange(40), rng.randrange(25)) for _ in range(300)})
    got = {
        (r["src"], r["dst"]): r["n_common"]
        for r in weighted_projection(_baskets(spark, rows), "basket", "item").collect()
    }
    want, _, _ = _brute_pairs(rows)
    assert got == want


def test_basket_size_cap(spark):
    rows = [(0, i) for i in range(10)] + [(1, 0), (1, 1), (2, 0), (2, 1)]
    got = {
        (r["src"], r["dst"]): r["n_common"]
        for r in weighted_projection(
            _baskets(spark, rows), "basket", "item", max_basket_size=5
        ).collect()
    }
    assert got == {(0, 1): 2}  # the 10-item basket is dropped


def test_similarity_metrics(spark):
    rng = random.Random(7)
    rows = list({(rng.randrange(30), rng.randrange(15)) for _ in range(200)})
    got = {
        (r["src"], r["dst"]): r
        for r in cooccurrence_similarity(
            _baskets(spark, rows), "basket", "item"
        ).collect()
    }
    want, deg, n = _brute_pairs(rows)
    assert set(got) == set(want)
    for (a, b), c in want.items():
        r = got[(a, b)]
        assert r["n_common"] == c
        assert abs(r["jaccard"] - c / (deg[a] + deg[b] - c)) < 1e-12
        assert abs(r["cosine"] - c / math.sqrt(deg[a] * deg[b])) < 1e-12
        assert abs(r["lift"] - c * n / (deg[a] * deg[b])) < 1e-12


def test_dedup_against(spark):
    train = spark.createDataFrame(
        [(0, "aa"), (1, "bb"), (2, "cc"), (3, "bb")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "bb"), (101, "zz")], "doc_id long, text string"
    )
    kept = sorted(
        r["doc_id"] for r in deduplicate_against(train, bench).collect()
    )
    assert kept == [0, 2]


def test_dedup_against_normalized(spark):
    train = spark.createDataFrame(
        [(0, "Hello  World"), (1, "other")], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(9, "hello world")], "doc_id long, text string")
    kept = [r["doc_id"] for r in
            deduplicate_against(train, bench, normalize=True).collect()]
    assert kept == [1]
    kept_raw = sorted(r["doc_id"] for r in
                      deduplicate_against(train, bench).collect())
    assert kept_raw == [0, 1]


def test_budget_select_prefix_semantics(spark):
    rows = [
        # group a: scores 9,8,7 costs 5,4,3 -> cum 5,9,12; budget 9 keeps 2
        (0, "a", 5, 9.0), (1, "a", 4, 8.0), (2, "a", 3, 7.0),
        # group b: single row over budget -> nothing kept
        (3, "b", 50, 1.0),
        # group c: tie on score breaks by id
        (4, "c", 5, 5.0), (5, "c", 5, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, cost long, score double"
    )
    kept = sorted(
        r["doc_id"]
        for r in budget_select(df, "grp", "cost", "score", budget=9).collect()
    )
    assert kept == [0, 1, 4]


def test_budget_select_cum_column(spark):
    rng = random.Random(13)
    rows = [(i, "g", rng.randrange(1, 10), float(rng.randrange(100)))
            for i in range(50)]
    df = spark.createDataFrame(
        rows, "doc_id long, grp string, cost long, score double"
    )
    out = budget_select(df, "grp", "cost", "score", budget=60,
                        keep_cum=True).collect()
    order = sorted(rows, key=lambda r: (-r[3], r[0]))
    acc, want = 0, []
    for did, _, cost, _ in order:
        if acc + cost > 60:
            break
        acc += cost
        want.append((did, acc))
    assert sorted((r["doc_id"], r["cum_cost"]) for r in out) == sorted(want)


def test_butterfly_count_brute_force(spark):
    from linkgraph.graph.projection import butterfly_count

    rng = random.Random(41)
    rows = list({(rng.randrange(20), rng.randrange(12)) for _ in range(120)})
    got = butterfly_count(_baskets(spark, rows), "basket", "item").collect()[0]
    members: dict[int, set] = {}
    for b, i in rows:
        members.setdefault(b, set()).add(i)
    want = 0
    for b1, b2 in itertools.combinations(sorted(members), 2):
        common = len(members[b1] & members[b2])
        want += common * (common - 1) // 2
    assert got["n_butterflies"] == want


def test_butterfly_count_k22_and_empty(spark):
    from linkgraph.graph.projection import butterfly_count

    k22 = _baskets(spark, [(0, 0), (0, 1), (1, 0), (1, 1)])
    assert butterfly_count(k22, "basket", "item").collect()[0][0] == 1
    nothing = _baskets(spark, [(0, 0), (1, 1)])
    assert butterfly_count(nothing, "basket", "item").collect()[0][0] == 0
