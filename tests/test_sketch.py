"""Count-Min sketch vs an exact Python replay of the same hashes."""

from __future__ import annotations

from collections import Counter, defaultdict

from linkgraph.dedup.phash import P1, sig_seeds
from linkgraph.text.sketch import cm_estimate, cm_sketch, heavy_hitters

DOCS = [
    "the cat sat on the mat",
    "the dog sat",
    "cat and dog and cat",
    "   ",
    "the the the",
]


def py_poly(s: str, mult: int = 31, mod: int = P1) -> int:
    h = 0
    for ch in s:
        h = (h * mult + ord(ch)) % mod
    return h


def py_bucket(term: str, row: int, width: int) -> int:
    a, b = sig_seeds(row)
    return ((a * py_poly(term) + b) % P1) % width


def py_sketch(docs, depth, width):
    sk = defaultdict(int)
    for d in docs:
        for t in d.strip().lower().split():
            for r in range(depth):
                sk[(r, py_bucket(t, r, width))] += 1
    return dict(sk)


def py_counts(docs):
    c = Counter()
    for d in docs:
        c.update(d.strip().lower().split())
    return c


def docs_df(spark, docs):
    return spark.createDataFrame([(d,) for d in docs], "text string")


def test_sketch_bit_exact_replay(spark):
    depth, width = 3, 16
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_sketch(docs_df(spark, DOCS), depth=depth, width=width).collect()
    }
    assert got == py_sketch(DOCS, depth, width)


def test_estimates_overcount_and_match_replay(spark):
    depth, width = 3, 16
    df = docs_df(spark, DOCS)
    sk_df = cm_sketch(df, depth=depth, width=width)
    queries = spark.createDataFrame(
        [("the",), ("cat",), ("unseen",)], "term string"
    )
    got = {
        r["term"]: r["cm_count"]
        for r in cm_estimate(sk_df, queries, depth=depth, width=width).collect()
    }
    sk = py_sketch(DOCS, depth, width)
    exact = py_counts(DOCS)
    for term in ["the", "cat", "unseen"]:
        want = min(
            sk.get((r, py_bucket(term, r, width)), 0) for r in range(depth)
        )
        assert got[term] == want, term
        assert got[term] >= exact[term]


def test_wide_sketch_is_exact(spark):
    # Width >> vocab: collisions are unlikely; with this seed family
    # and 8 distinct terms at width 4096 there are none, so every
    # estimate equals the exact count.
    df = docs_df(spark, DOCS)
    hh = heavy_hitters(df, top_n=10, depth=4, width=4096).collect()
    exact = py_counts(DOCS)
    assert len(hh) == len(exact)
    for r in hh:
        assert r["cm_count"] == r["freq"] == exact[r["term"]], r
    # rank order: freq desc, term asc
    ranked = sorted(hh, key=lambda r: (-r["freq"], r["term"]))
    assert [r["rank"] for r in ranked] == list(range(1, len(hh) + 1))


def test_narrow_sketch_collides_but_never_undercounts(spark):
    df = docs_df(spark, DOCS)
    hh = heavy_hitters(df, top_n=10, depth=2, width=4).collect()
    exact = py_counts(DOCS)
    assert any(r["cm_count"] > r["freq"] for r in hh)  # width 4 must collide
    for r in hh:
        assert r["freq"] == exact[r["term"]]
        assert r["cm_count"] >= r["freq"]
