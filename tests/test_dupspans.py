"""Duplicate n-gram spans vs a brute-force Python replay."""

from __future__ import annotations

from collections import Counter

from linkgraph.text.dupspans import duplicate_fraction, duplicate_spans


def brute_spans(docs, n):
    toks = {i: d.strip().lower().split() for i, d in docs}
    occ = Counter()
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            occ[" ".join(ws[p : p + n])] += 1
    spans = {}
    for i, ws in toks.items():
        dup = sorted(
            p
            for p in range(len(ws) - n + 1)
            if occ[" ".join(ws[p : p + n])] >= 2
        )
        out = []
        for p in dup:
            if out and p == out[-1][1] + 1:
                out[-1] = (out[-1][0], p)
            else:
                out.append((p, p))
        spans[i] = [(s, e - s + n) for s, e in out]
    return spans


def docs_df(spark, docs):
    return spark.createDataFrame(docs, "doc_id long, text string")


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog today"),
    (2, "something else then the quick brown fox jumps high"),
    (3, "completely unrelated words in this one here now"),
    (4, "the quick brown fox jumps over the lazy dog today again"),
    (5, "short doc"),
]


def test_spans_vs_brute(spark):
    n = 4
    got = {}
    for r in duplicate_spans(docs_df(spark, DOCS), n=n).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_len"])
        )
    want = {k: v for k, v in brute_spans(DOCS, n).items() if v}
    assert {k: sorted(v) for k, v in got.items()} == want
    # doc 1 is fully covered by doc 4's repetition of its entire text
    assert got[1] == [(0, 10)]
    # doc 2 shares only "the quick brown fox jumps"
    assert got[2] == [(3, 5)]
    assert 3 not in got and 5 not in got


def test_intra_document_repetition_counts(spark):
    docs = [(1, "a b c d x x a b c d")]
    got = [
        (r["span_start"], r["span_len"])
        for r in duplicate_spans(docs_df(spark, docs), n=4).collect()
    ]
    # "a b c d" occurs twice within the same document.
    assert sorted(got) == [(0, 4), (6, 4)]


def test_fraction_rollup(spark):
    n = 4
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
        for r in duplicate_fraction(docs_df(spark, DOCS), n=n).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5}  # every doc gets a row
    want = brute_spans(DOCS, n)
    for i, text in DOCS:
        ws = text.split()
        dup = sum(l for _, l in want[i])
        assert got[i][0] == len(ws)
        assert got[i][1] == dup
        assert abs(got[i][2] - dup / len(ws)) < 1e-12
    assert got[3][1] == 0 and got[5][1] == 0
