"""Tokenizer APPLICATION: greedy longest-match (WordPiece-style)
corpus encoding against a fixed subword vocabulary.

Not in the reference (no text layer). Completes the tokenizer story:
`bpe.py` TRAINS a merge list; this module APPLIES a subword vocabulary
to the corpus — the encode step every training-data pipeline runs over
its full 100 TB once per tokenizer version.

Algorithm (WordPiece greedy, Wu et al. 2016 "Google's Neural Machine
Translation System" §4.1 / Devlin et al. 2018 BERT tokenizer): per
word, repeatedly take the LONGEST vocabulary entry that prefixes the
remaining suffix; a position where no entry matches falls back to the
single character (so every word always tokenizes and nothing is
dropped — the `[UNK]`-free variant, deterministic and total).

Scale design (same bounded-vocab shape as bpe.py / vocab.py):
- the corpus pays ONE split+explode+distinct to the word table, which
  is bounded by vocabulary size, not corpus size;
- the greedy matcher is an Arrow-batched kernel over that bounded
  word table only — Python never touches the corpus;
- the (word -> tokens) map joins back to the exploded corpus with a
  broadcast hint (the word table is vocab-bounded), positions ride a
  posexplode so document order is reconstructible;
- per-document token arrays are reassembled with a sorted
  collect_list aggregate keyed by the document.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def greedy_tokenize_word(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-prefix-match segmentation; single-char fallback."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        match = None
        # longest first: scan down from the full remaining suffix
        for j in range(n, i, -1):
            if word[i:j] in vocab:
                match = word[i:j]
                break
        if match is None:
            match = word[i]
        out.append(match)
        i += len(match)
    return out


def word_tokens(words: DataFrame, vocab: list[str]) -> DataFrame:
    """(word, tokens array<string>) over a bounded word table."""
    vset = set(vocab)
    schema = "word string, tokens array<string>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "tokens": [
                        greedy_tokenize_word(w, vset) for w in pdf["word"]
                    ],
                }
            )

    return words.select("word").mapInPandas(kernel, schema)


def encode_corpus(
    df: DataFrame,
    vocab: list[str],
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — the corpus greedily
    encoded against ``vocab``, word boundaries at whitespace, words
    lowercased (the `word_frequencies` convention).

    One corpus pass; Python work bounded by the distinct-word table.
    """
    words_col = F.split(F.trim(F.lower(F.col(col))), r"\s+")
    exploded = (
        df.where(F.length(F.trim(F.col(col))) > 0)
        .select(F.col(id_col).alias("id"), F.posexplode(words_col).alias("pos", "word"))
        .where(F.length("word") > 0)
    )
    wt = word_tokens(exploded.select("word").distinct(), vocab)
    joined = exploded.join(F.broadcast(wt), "word")
    return (
        joined.groupBy("id")
        .agg(
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct("pos", "tokens"))
                ).getField("tokens")
            ).alias("tokens")
        )
        .select("id", "tokens", F.size("tokens").alias("n_tokens"))
    )
