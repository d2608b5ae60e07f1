"""Gopher quality rules vs an exact Python replay."""

from __future__ import annotations

import re

from linkgraph.text.gopher import STOPWORDS, apply_gopher, gopher_filters

GOOD = (
    "The quick brown fox decided that it would be wise to have a plan "
    "and to move with purpose through the quiet forest. "
) * 4  # ~80 words, normal shape, plenty of stopwords

DOCS = [
    (1, GOOD),
    (2, "tiny doc"),                                     # too few words
    (3, "## " * 60 + "the be to of and have words with more here"),  # symbol-heavy
    (4, "- one\n- two\n- three\n- four\n- five\n- six\n- seven\n- eight\n- nine\n- ten\n"
        + GOOD),                                          # bullets but under ratio w/ body
    (5, ("a... \n" * 10) + "the be to of"),               # ellipsis lines
    (6, "12345 67890 " * 60),                             # no alphabetic words
    (7, ""),                                              # empty
]


def py_stats(text):
    t = text.strip()
    words = re.split(r"\s+", t) if t else []
    n_words = len(words)
    mean_wl = sum(len(w) for w in words) / n_words if n_words else 0.0
    hash_ratio = text.count("#") / n_words if n_words else 0.0
    ell_sym_ratio = (
        len(re.findall(r"\.\.\.|…", text)) / n_words if n_words else 0.0
    )
    lines = [l for l in text.split("\n") if l.strip()]
    n_lines = len(lines)
    bullet = (
        sum(
            1
            for l in lines
            if l.strip().startswith(("- ", "* ", "•"))
        ) / n_lines
        if n_lines
        else 0.0
    )
    ell = (
        sum(1 for l in lines if l.strip().endswith(("...", "…"))) / n_lines
        if n_lines
        else 0.0
    )
    alpha = (
        sum(1 for w in words if re.search("[A-Za-z]", w)) / n_words
        if n_words
        else 0.0
    )
    low = {w.lower() for w in words}
    stop_hits = sum(1 for s in STOPWORDS if s in low)
    return (
        n_words,
        round(mean_wl, 6),
        round(hash_ratio, 6),
        round(ell_sym_ratio, 6),
        round(bullet, 6),
        round(ell, 6),
        round(alpha, 6),
        stop_hits,
    )


def test_stats_vs_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["g_n_words"], r["g_mean_word_len"], r["g_hash_ratio"],
            r["g_ellipsis_sym_ratio"],
            r["g_bullet_ratio"], r["g_ellipsis_ratio"],
            r["g_alpha_word_ratio"], r["g_stop_hits"],
        )
        for r in gopher_filters(df, min_words=20).collect()
    }
    for i, text in DOCS:
        want = py_stats(text)
        assert got[i][0] == want[0], i
        for g, w in zip(got[i][1:7], want[1:7]):
            assert abs(g - w) < 1e-9, (i, got[i], want)
        assert got[i][7] == want[7], i


def test_verdicts(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    keep = {
        r["doc_id"]: r["keep_gopher"]
        for r in gopher_filters(df, min_words=20).collect()
    }
    assert keep[1] is True        # normal prose survives
    assert keep[2] is False       # too short
    assert keep[3] is False       # symbol ratio
    assert keep[5] is False       # ellipsis lines
    assert keep[6] is False       # no alphabetic words
    assert keep[7] is False       # empty
    survivors = {
        r["doc_id"] for r in apply_gopher(df, min_words=20).collect()
    }
    assert survivors == {i for i, k in keep.items() if k}
