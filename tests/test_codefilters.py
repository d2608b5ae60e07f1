"""StarCoder-style code filters vs a Python replay."""

from __future__ import annotations

import re

from linkgraph.text.codefilters import code_quality_features

DOCS = [
    (1, "import os\n# a comment\n\nx = 1\nprint(x)"),
    (2, "// auto-generated file, DO NOT EDIT\nint x = 0;"),
    (3, "data," + "1," * 600),                    # one huge line
    (4, ";;;;;;;;;;\n!!!!!!!!!!\n.........."),    # low alnum
    (5, ""),
    (6, "short\nlines\nhere\n# ok"),
]


def py_features(text, max_line=1000, max_avg=100, min_alnum=0.25):
    lines = text.split("\n")
    trimmed = [l.strip() for l in lines]
    n_lines = len(lines)
    n_blank = sum(1 for l in trimmed if not l)
    n_comment = sum(
        1 for l in trimmed if l.startswith("#") or l.startswith("//")
    )
    lens = [len(l) for l in lines]
    max_len = max(lens) if lens else 0
    avg_len = sum(lens) / n_lines if n_lines else 0.0
    alnum = len(re.sub(r"[^0-9A-Za-z]", "", text))
    frac = alnum / len(text) if text else 0.0
    autogen = bool(re.search("auto-generated|do not edit", text.lower()))
    keep = (
        len(text) > 0
        and max_len <= max_line
        and avg_len <= max_avg
        and frac >= min_alnum
        and not autogen
    )
    return (n_lines, n_blank, n_comment, max_len, avg_len, frac, autogen, keep)


def test_features_vs_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"], r["n_blank"], r["n_comment"], r["max_line_len"],
            r["avg_line_len"], r["alnum_fraction"], r["autogen"], r["keep"],
        )
        for r in code_quality_features(df).collect()
    }
    for i, text in DOCS:
        want = py_features(text)
        assert got[i][:4] == want[:4], i
        assert abs(got[i][4] - want[4]) < 1e-12
        assert abs(got[i][5] - want[5]) < 1e-12
        assert got[i][6:] == want[6:], i
    # the verdicts the rules were designed for
    assert got[1][7] is True          # normal code kept
    assert got[2][7] is False         # autogen dropped
    assert got[3][7] is False         # huge line dropped
    assert got[4][7] is False         # low-alnum dropped
    assert got[5][7] is False         # empty dropped
    assert got[6][7] is True
