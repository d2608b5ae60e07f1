"""PMI co-occurrence vs brute-force python oracle."""

from __future__ import annotations

import math
from itertools import combinations

from linkgraph.text.pmi import pmi_pairs


def docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


def brute_pmi(docs, min_pairs=2, max_df_frac=None):
    sets = [set(d.strip().lower().split()) for d in docs if d.strip()]
    n = len(sets)
    df: dict[str, int] = {}
    for s in sets:
        for w in s:
            df[w] = df.get(w, 0) + 1
    if max_df_frac is not None:
        keep = {w for w, c in df.items() if c <= n * max_df_frac}
        sets = [s & keep for s in sets]
        df = {w: c for w, c in df.items() if w in keep}
    co: dict[tuple[str, str], int] = {}
    for s in sets:
        for a, b in combinations(sorted(s), 2):
            co[(a, b)] = co.get((a, b), 0) + 1
    out = {}
    for (a, b), c in co.items():
        if c < min_pairs:
            continue
        pmi = math.log(c * n / (df[a] * df[b]))
        npmi = 1.0 if c == n else pmi / -math.log(c / n)
        out[(a, b)] = (c, pmi, npmi)
    return out


DOCS = [
    "new york city is big",
    "new york has tall towers",
    "los angeles is big",
    "the city of los angeles",
    "new york new york",
    "is small",  # makes (big, is) an imperfect pair: df(is)=3, c=2
    "",
]


def collect(df):
    return {
        (r["term_a"], r["term_b"]): (r["n_pairs"], r["pmi"], r["npmi"])
        for r in df.collect()
    }


def test_pmi_matches_brute(spark):
    got = collect(pmi_pairs(docs_df(spark, DOCS), min_pairs=2))
    want = brute_pmi(DOCS, min_pairs=2)
    assert got.keys() == want.keys()
    for k, (c, pmi, npmi) in want.items():
        assert got[k][0] == c
        assert abs(got[k][1] - pmi) < 1e-9
        assert abs(got[k][2] - npmi) < 1e-9
    # collocation beats background pairs
    assert got[("new", "york")][2] > got[("big", "is")][2]


def test_df_cap_drops_stopwords(spark):
    got = collect(pmi_pairs(docs_df(spark, DOCS), min_pairs=2, max_df_frac=0.5))
    want = brute_pmi(DOCS, min_pairs=2, max_df_frac=0.5)
    assert got.keys() == want.keys()
    for k, (c, pmi, npmi) in want.items():
        assert got[k][0] == c and abs(got[k][1] - pmi) < 1e-9


def test_perfect_cooccurrence_npmi_is_one(spark):
    docs = ["salt pepper", "salt pepper", "salt pepper mill"]
    got = collect(pmi_pairs(docs_df(spark, docs), min_pairs=2))
    assert got[("pepper", "salt")][2] == 1.0
