"""Repetition quality signals vs hand-computed values."""

from __future__ import annotations

import pytest

from linkgraph.text.repetition import (
    gopher_repetition_filter,
    line_repetition,
    ngram_repetition,
    repetition_features,
)


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def one(df, doc_id=0):
    return [r.asDict() for r in df.collect() if r["doc_id"] == doc_id][0]


def test_line_fractions(spark):
    # 4 lines, "dup" appears 3x: dup_line_frac = 1 - 2/4 = 0.5.
    # chars: all = 3*3 + 6 = 15, distinct = 3 + 6 = 9 -> 1 - 9/15 = 0.4.
    t = "dup\ndup\ndup\nunique"
    r = one(line_repetition(docs(spark, [t])))
    assert r["dup_line_frac"] == pytest.approx(0.5)
    assert r["dup_line_char_frac"] == pytest.approx(1 - 9 / 15)
    # one paragraph (no blank lines): no paragraph dup.
    assert r["dup_para_frac"] == 0.0


def test_para_fractions(spark):
    t = "para one\n\npara one\n\npara two"
    r = one(line_repetition(docs(spark, [t])))
    assert r["dup_para_frac"] == pytest.approx(1 - 2 / 3)
    assert r["dup_para_char_frac"] == pytest.approx(1 - 16 / 24)
    # lines within paragraphs are all distinct except the repeat
    assert r["dup_line_frac"] == pytest.approx(1 - 2 / 3)


def test_top_ngram_fraction(spark):
    # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" x3
    t = "a b a b a b"
    r = one(ngram_repetition(docs(spark, [t]), top_ns=(2,), dup_ns=()))
    assert r["top2_gram_char_frac"] == pytest.approx(3 * 3 / len(t))


def test_dup_ngram_fraction_and_short_doc_zero(spark):
    t5 = "v w x y z v w x y z"  # the 5-gram "v w x y z" occurs twice
    short = "tiny doc"
    df = ngram_repetition(docs(spark, [t5, short]), top_ns=(), dup_ns=(5,))
    r5 = one(df, 0)
    # dup cover = 2 * 9 = 18 over 19 chars
    assert r5["dup5_gram_char_frac"] == pytest.approx(18 / len(t5))
    assert one(df, 1)["dup5_gram_char_frac"] == 0.0


def test_gopher_filter_drops_spam_keeps_prose(spark):
    spam = "buy now " * 50
    prose = " ".join(f"w{i}a w{i}b w{i}c" for i in range(40))
    kept = gopher_repetition_filter(docs(spark, [spam, prose]))
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_repetition_features_all_columns(spark):
    cols = set(repetition_features(docs(spark, ["hello world"])).columns)
    want = {
        "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
        "dup_para_char_frac", "top2_gram_char_frac", "top3_gram_char_frac",
        "top4_gram_char_frac", "dup5_gram_char_frac", "dup10_gram_char_frac",
    }
    assert want <= cols
