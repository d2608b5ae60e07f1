"""BPE training vs an exact pure-Python reference implementation."""

from __future__ import annotations

from collections import Counter

from linkgraph.text.bpe import (
    bpe_encode_words,
    bpe_pair_counts,
    train_bpe,
    word_frequencies,
)

DOCS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new"),
    (3, "wide wider widest low new"),
]


def py_word_freqs():
    c = Counter()
    for _, t in DOCS:
        c.update(t.strip().lower().split())
    return dict(c)


def py_apply(symbols, merges):
    for a, b in merges:
        out, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(symbols[i])
                i += 1
        symbols = out
    return symbols


def py_pairs(merges):
    c = Counter()
    for w, f in py_word_freqs().items():
        s = py_apply(list(w), merges)
        for p in zip(s, s[1:]):
            c[p] += f
    return dict(c)


def py_train(n):
    merges = []
    for _ in range(n):
        pairs = py_pairs(merges)
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append(best[0])
    return merges


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_char_pair_counts(spark):
    wf = word_frequencies(_docs(spark))
    got = {
        (r["left"], r["right"]): r["count"]
        for r in bpe_pair_counts(wf).collect()
    }
    assert got == py_pairs([])


def test_pair_counts_after_merges(spark):
    merges = py_train(3)
    wf = word_frequencies(_docs(spark))
    got = {
        (r["left"], r["right"]): r["count"]
        for r in bpe_pair_counts(wf, merges).collect()
    }
    assert got == py_pairs(merges)


def test_train_matches_reference(spark):
    got = train_bpe(_docs(spark), n_merges=6)
    assert got == py_train(6)


def test_encode_words(spark):
    merges = py_train(4)
    wf = word_frequencies(_docs(spark))
    got = {
        r["word"]: list(r["tokens"])
        for r in bpe_encode_words(wf, merges).collect()
    }
    for w in py_word_freqs():
        assert got[w] == py_apply(list(w), merges), w


def py_train_batched(n, batch):
    """Pure-Python replica of the batched trainer's semantics."""
    merges = []
    while len(merges) < n:
        want = min(batch, n - len(merges))
        pairs = py_pairs(merges)
        if not pairs:
            break
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        used, chosen = set(), []
        for (a, b), _ in ranked[: max(want * 8, 8)]:
            if a in used or b in used:
                continue
            chosen.append((a, b))
            used.update((a, b))
            if len(chosen) >= want:
                break
        if not chosen:
            break
        merges.extend(chosen)
    return merges


def test_train_batched_matches_python_replay(spark):
    for batch in (2, 3):
        got = train_bpe(_docs(spark), n_merges=6, batch=batch)
        assert got == py_train_batched(6, batch), batch


def test_train_batch1_is_exact_greedy(spark):
    # batch=1 must remain EXACTLY the classical greedy trainer
    assert train_bpe(_docs(spark), n_merges=6, batch=1) == py_train(6)


def test_batched_merges_are_disjoint_per_round(spark):
    merges = train_bpe(_docs(spark), n_merges=6, batch=3)
    # every round's selections share no symbol
    for i in range(0, len(merges), 3):
        syms = [s for p in merges[i : i + 3] for s in p]
        assert len(syms) == len(set(syms)), merges[i : i + 3]
