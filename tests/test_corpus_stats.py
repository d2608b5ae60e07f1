"""Corpus term stats vs brute-force python oracle."""

from __future__ import annotations

import math
from collections import Counter

from linkgraph.text.stats import corpus_stats, term_frequencies


def docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


DOCS = [
    "the cat and the hat",
    "the cat sat",
    "a hat and a bat",
    "the end",
    "",
]


def brute_counts(docs):
    return Counter(w for d in docs if d.strip() for w in d.strip().lower().split())


def test_term_frequencies_rank_and_ties(spark):
    got = [
        (r["rank"], r["term"], r["freq"])
        for r in term_frequencies(docs_df(spark, DOCS), top_n=5)
        .orderBy("rank")
        .collect()
    ]
    counts = brute_counts(DOCS)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(i + 1, t, f) for i, (t, f) in enumerate(want)]


def test_corpus_stats_values(spark):
    row = corpus_stats(docs_df(spark, DOCS), zipf_top=4).collect()[0]
    counts = brute_counts(DOCS)
    assert row["n_tokens"] == sum(counts.values())
    assert row["vocab_size"] == len(counts)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(f) for _, f in top]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert abs(row["zipf_slope"] - slope) < 1e-9
    assert slope < 0  # frequencies decay with rank


def test_length_percentiles_match_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from linkgraph.text.stats import length_percentiles

    vals = {"en": [10, 20, 30, 40, 55, 200], "de": [5, 7, 9]}
    rows = [(lang, v) for lang, vs in vals.items() for v in vs]
    df = spark.createDataFrame(rows, "lang string, n_chars int")
    got = {r["lang"]: r for r in length_percentiles(df).collect()}
    for lang, vs in vals.items():
        for q in (25, 50, 75, 90, 99):
            want = float(np.percentile(vs, q))  # numpy default = type 7
            assert abs(got[lang][f"p{q}"] - round(want, 6)) < 1e-9, (lang, q)
        assert got[lang]["n_docs"] == len(vs)
