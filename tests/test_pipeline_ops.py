"""TF-IDF / deterministic sampling / decontamination vs python oracles."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from linkgraph.sampling import hash_sample, stratified_sample, train_eval_split
from linkgraph.text.decontam import ngram_contamination
from linkgraph.text.tfidf import tfidf_top_terms

DOCS = [
    (1, "the cat sat on the mat the cat"),
    (2, "the dog sat on the log"),
    (3, "cats and dogs and cats"),
    (4, "entirely unrelated words here"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def brute_tfidf(docs, k, min_df):
    import re

    toks = {i: re.findall("[a-z]+", t.lower()) for i, t in docs}
    n = len(docs)
    tf = {(i, w): ts.count(w) for i, ts in toks.items() for w in set(ts)}
    df = {}
    for (_, w), _c in tf.items():
        df[w] = df.get(w, 0) + 1
    out = {}
    for i, ts in toks.items():
        scored = sorted(
            (
                (-(tf[(i, w)] * (math.log((n + 1) / (df[w] + 1)) + 1)), w)
                for w in set(ts)
                if df[w] >= min_df
            ),
        )
        out[i] = [
            (r + 1, w, tf[(i, w)], -neg) for r, (neg, w) in enumerate(scored[:k])
        ]
    return out


def test_tfidf_vs_brute(docs):
    got = {}
    for r in tfidf_top_terms(docs, k=3, min_df=1).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["score"])
        )
    want = brute_tfidf(DOCS, k=3, min_df=1)
    for i in want:
        g = sorted(got.get(i, []))
        w = sorted(want[i])
        assert len(g) == len(w), (i, g, w)
        for (gr, gt, gtf, gs), (wr, wt, wtf, ws) in zip(g, w):
            assert (gr, gt, gtf) == (wr, wt, wtf)
            assert abs(gs - ws) < 1e-9


def test_tfidf_min_df_prunes(docs):
    out = tfidf_top_terms(docs, k=10, min_df=2)
    terms = {r["term"] for r in out.collect()}
    # words appearing in only one doc are gone
    assert "mat" not in terms and "log" not in terms
    assert "the" in terms and "sat" in terms  # both appear in docs 1 and 2


def test_hash_sample_deterministic_and_by_key(spark):
    df = spark.createDataFrame(
        [(i % 100, f"row{i}") for i in range(1000)], "key long, payload string"
    )
    s1 = hash_sample(df, "key", 0.3, salt="s")
    s2 = hash_sample(df, "key", 0.3, salt="s")
    assert sorted(r["payload"] for r in s1.collect()) == sorted(
        r["payload"] for r in s2.collect()
    )
    # by-key: every key keeps all 10 of its rows or none
    per_key = s1.groupBy("key").count().collect()
    assert all(r["count"] == 10 for r in per_key)
    # roughly the requested fraction of the 100 keys
    assert 15 <= len(per_key) <= 45


def test_hash_sample_portable_matches_default_semantics(spark):
    # portable and default families differ in WHICH keys they keep, but
    # both are deterministic and key-consistent.
    df = spark.createDataFrame([(i,) for i in range(500)], "key long")
    kept = hash_sample(df, "key", 0.25, portable=True).count()
    assert 80 <= kept <= 170  # ~125 expected, avalanche-mixed


def test_train_eval_split_disjoint_exhaustive(spark):
    df = spark.createDataFrame([(i,) for i in range(400)], "key long")
    train, ev = train_eval_split(df, "key", eval_fraction=0.1)
    nt, ne = train.count(), ev.count()
    assert nt + ne == 400
    assert train.join(ev, "key", "inner").count() == 0
    assert 10 <= ne <= 80


def test_stratified_sample(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, "key long, lang string")
    out = stratified_sample(
        df, "key", "lang", {"en": 1.0, "de": 0.0}, default_fraction=0.0
    )
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}
    assert out.count() == 300  # fraction 1.0 keeps every en key


def brute_contam(train, bench, n):
    def grams(t):
        ws = t.lower().strip().split()
        return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    bg = set().union(*(grams(t) for _, t in bench)) if bench else set()

    def count(t):
        ws = t.lower().strip().split()
        return sum(
            1 for i in range(max(len(ws) - n + 1, 0)) if " ".join(ws[i : i + n]) in bg
        )

    return {i: count(t) for i, t in train}


def test_decontam_vs_brute(spark):
    bench = [(100, "the cat sat on the mat today")]
    train = [
        (1, "we saw that the cat sat on the mat today and left"),  # contaminated
        (2, "the dog sat on the log"),                             # clean
        (3, "cat sat on the mat"),                                 # exactly n words
        (4, "tiny"),                                               # < n words
    ]
    out = ngram_contamination(
        spark.createDataFrame(train, "doc_id long, text string"),
        spark.createDataFrame(bench, "doc_id long, text string"),
        n=5,
    )
    got = {r["doc_id"]: (r["n_contaminated"], r["contaminated"]) for r in out.collect()}
    want = brute_contam(train, bench, 5)
    assert got == {i: (c, c > 0) for i, c in want.items()}
    assert got[1][1] is True and got[2][1] is False
    # every training doc present, including the sub-n-gram one
    assert set(got) == {1, 2, 3, 4}


def test_decontam_empty_benchmark(spark, docs):
    empty = docs.where("doc_id < 0")
    out = ngram_contamination(docs, empty, n=3)
    assert out.where("contaminated").count() == 0
    assert out.count() == docs.count()


def test_weighted_sample_monotone_and_deterministic(spark):
    from linkgraph.sampling import weighted_sample
    from pyspark.sql import functions as F

    d = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 100 / 100.0).alias("wt")
    )
    lo = {r["doc_id"] for r in weighted_sample(d, "doc_id", "wt", scale=0.5).collect()}
    hi = {r["doc_id"] for r in weighted_sample(d, "doc_id", "wt", scale=1.0).collect()}
    again = {r["doc_id"] for r in weighted_sample(d, "doc_id", "wt", scale=1.0).collect()}
    assert hi == again                      # deterministic
    assert lo <= hi                         # monotone in scale per key
    # weight >= 1/scale -> always kept
    heavy = d.withColumn("wt", F.lit(2.0))
    assert weighted_sample(heavy, "doc_id", "wt", scale=1.0).count() == 2000
    # zero weight -> never kept
    zero = d.withColumn("wt", F.lit(0.0))
    assert weighted_sample(zero, "doc_id", "wt", scale=1.0).count() == 0
    # keep rate tracks mean weight (mean wt ~ 0.495)
    assert abs(len(hi) / 2000 - 0.495) < 0.05
