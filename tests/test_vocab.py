"""Vocabulary construction + OOV accounting vs a Python replay."""

from __future__ import annotations

from collections import Counter

from linkgraph.text.vocab import build_vocab, oov_stats

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "a cat and a dog and a bird"),
    (4, ""),
    (5, "zebra"),
]


def py_vocab(max_size, min_count):
    c = Counter()
    for _, t in DOCS:
        if t.strip():
            c.update(t.strip().lower().split())
    items = [(t, n) for t, n in c.items() if n >= min_count]
    items.sort(key=lambda x: (-x[1], x[0]))
    return [(i, t, n) for i, (t, n) in enumerate(items[:max_size])]


def test_vocab_ids_deterministic(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["token_id"], r["term"], r["freq"])
        for r in build_vocab(df, max_size=6, min_count=2)
        .orderBy("token_id")
        .collect()
    ]
    assert got == py_vocab(6, 2)
    # determinism across partitioning
    got2 = [
        (r["token_id"], r["term"], r["freq"])
        for r in build_vocab(df.repartition(7), max_size=6, min_count=2)
        .orderBy("token_id")
        .collect()
    ]
    assert got2 == got


def test_oov_stats(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    vocab = build_vocab(df, max_size=4, min_count=2)
    kept = {r["term"] for r in vocab.collect()}
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_stats(df, vocab).collect()
    }
    for i, t in DOCS:
        toks = t.strip().lower().split() if t.strip() else []
        if not toks:
            assert i not in got
            continue
        oov = sum(1 for x in toks if x not in kept)
        assert got[i][0] == len(toks), i
        assert got[i][1] == oov, i
        assert abs(got[i][2] - round(oov / len(toks), 6)) < 1e-12
