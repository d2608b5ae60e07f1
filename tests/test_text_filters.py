"""Unigram LM scoring, C4 filters, paragraph dedup, and PII redaction
vs hand-computed / brute-force python oracles."""

from __future__ import annotations

import math
from collections import Counter

from linkgraph.dedup.paragraphs import paragraph_dedup
from linkgraph.text.c4 import apply_c4, c4_filters
from linkgraph.text.lm import unigram_lm_scores
from linkgraph.text.pii import pii_features, redact_pii


def docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )


# -- unigram LM ---------------------------------------------------------------


def brute_lm(docs):
    toks = [d.strip().lower().split() for d in docs if d.strip()]
    corpus = Counter(w for ws in toks for w in ws)
    t_total, v = sum(corpus.values()), len(corpus)
    out = {}
    for i, ws in enumerate(d.strip().lower().split() for d in docs):
        if not ws:
            continue
        lp = sum(math.log((corpus[w] + 1) / (t_total + v)) for w in ws) / len(ws)
        out[i] = (len(ws), lp)
    return out


def test_unigram_lm_matches_brute(spark):
    docs = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "zqx qzk vvw",  # gibberish: rare tokens, low score
        "the the the the",
    ]
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"])
        for r in unigram_lm_scores(docs_df(spark, docs)).collect()
    }
    want = brute_lm(docs)
    assert got.keys() == want.keys()
    for k, (n, lp) in want.items():
        assert got[k][0] == n
        assert abs(got[k][1] - lp) < 1e-9
    # gibberish scores strictly below the common-token docs
    assert got[2][1] < got[0][1] and got[2][1] < got[1][1]


def test_unigram_lm_perplexity_positive(spark):
    docs = ["a b c", "a a a", ""]
    rows = unigram_lm_scores(docs_df(spark, docs)).collect()
    assert {r["doc_id"] for r in rows} == {0, 1}  # empty doc omitted
    for r in rows:
        assert r["perplexity"] > 1.0
        assert abs(r["perplexity"] - math.exp(-r["avg_logprob"])) < 1e-9


# -- C4 filters ---------------------------------------------------------------


def test_c4_line_rules(spark):
    text = (
        "This line has five good words.\n"
        "short line.\n"                      # < 5 words -> dropped
        "No terminal punctuation here at all\n"  # no punct -> dropped
        "   \n"                              # blank -> not a line
        'A quoted sentence ends with a quote."\n'
        "Is this a question with six words?"
    )
    row = c4_filters(docs_df(spark, [text])).collect()[0]
    assert row["n_lines"] == 5
    assert row["n_kept_lines"] == 3
    assert row["text_clean"].splitlines()[0] == "This line has five good words."
    assert row["n_sentences"] == 3
    assert not row["has_brace"] and not row["has_lorem"]
    assert row["keep_doc"]


def test_c4_doc_rules(spark):
    docs = [
        "Code doc { return 1; } with sentences. More here. And more.",
        "Lorem Ipsum dolor sit amet is placeholder filler text okay.",
        "One good sentence only stands here.",
    ]
    rows = {r["doc_id"]: r for r in c4_filters(docs_df(spark, docs)).collect()}
    assert rows[0]["has_brace"] and not rows[0]["keep_doc"]
    assert rows[1]["has_lorem"] and not rows[1]["keep_doc"]
    assert rows[2]["n_sentences"] < 3 and not rows[2]["keep_doc"]
    kept = apply_c4(docs_df(spark, docs))
    assert kept.count() == 0
    assert "text_clean" in kept.columns


# -- paragraph dedup ----------------------------------------------------------


def brute_para_dedup(docs, sep="\n\n"):
    seen = set()
    out = {}
    paras_by_doc = {
        i: [p.strip() for p in t.split(sep) if p.strip()] for i, t in enumerate(docs)
    }
    for i in sorted(paras_by_doc):
        kept = []
        for p in paras_by_doc[i]:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        out[i] = (len(paras_by_doc[i]), len(kept), sep.join(kept))
    return out


def test_paragraph_dedup_first_occurrence_wins(spark):
    docs = [
        "alpha beta\n\nshared paragraph one\n\ngamma",
        "shared paragraph one\n\ndelta epsilon",
        "shared paragraph one\n\nalpha beta\n\nzeta",
        "",
    ]
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_dedup"])
        for r in paragraph_dedup(docs_df(spark, docs)).collect()
    }
    want = brute_para_dedup(docs)
    want[3] = (0, 0, "")
    assert got == want


def test_paragraph_dedup_within_doc(spark):
    # duplicate inside one document: only the first position survives
    docs = ["same para\n\nsame para\n\nother"]
    got = paragraph_dedup(docs_df(spark, docs)).collect()[0]
    assert (got["n_paras"], got["n_kept"]) == (3, 2)
    assert got["text_dedup"] == "same para\n\nother"


# -- PII ----------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    docs = [
        "reach me at jane.doe+x@example.co.uk or +442071838750 thanks",
        "server 10.0.0.1 and 192.168.1.255 up",
        "clean text with no pii at all",
        "bad ip 999.999.999.999 still matches the shape",
    ]
    feats = {
        r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["n_phones"])
        for r in pii_features(docs_df(spark, docs)).collect()
    }
    assert feats[0] == (1, 0, 1)
    assert feats[1] == (0, 2, 0)
    assert feats[2] == (0, 0, 0)
    assert feats[3] == (0, 1, 0)  # shape-only detector, documented

    red = {
        r["doc_id"]: r["text_redacted"]
        for r in redact_pii(docs_df(spark, docs)).collect()
    }
    assert red[0] == "reach me at <EMAIL> or <PHONE> thanks"
    assert red[1] == "server <IP> and <IP> up"
    assert red[2] == docs[2]
