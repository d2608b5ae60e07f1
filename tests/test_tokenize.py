"""Greedy longest-match corpus encoding vs an exact Python replay."""

from __future__ import annotations

from linkgraph.text.tokenize import encode_corpus, greedy_tokenize_word

VOCAB = ["the", "er", "low", "lower", "ne", "new", "west", "qu", "ick"]

DOCS = [
    (1, "the quick lower newest"),
    (2, "low low lowers"),
    (3, "   "),          # blank -> dropped (no row)
    (4, "zzz"),           # fully out-of-vocab -> single chars
    (5, "The LOWER"),     # lowercased before matching
]


def py_encode(text):
    vset = set(VOCAB)
    out = []
    for w in text.strip().lower().split():
        if not w:
            continue
        i = 0
        while i < len(w):
            m = None
            for j in range(len(w), i, -1):
                if w[i:j] in vset:
                    m = w[i:j]
                    break
            if m is None:
                m = w[i]
            out.append(m)
            i += len(m)
    return out


def test_greedy_word_matches_replay():
    for w in ("lowernewest", "thequick", "zzz", "l", "westwest"):
        assert greedy_tokenize_word(w, set(VOCAB)) == py_encode(w)


def test_longest_match_wins():
    # "lower" must tokenize as ["lower"], not ["low", "er"]
    assert greedy_tokenize_word("lower", set(VOCAB)) == ["lower"]
    # suffix after a long match still matches greedily
    assert greedy_tokenize_word("lowerick", set(VOCAB)) == ["lower", "ick"]


def test_encode_corpus_vs_replay(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["id"]: (list(r["tokens"]), r["n_tokens"])
        for r in encode_corpus(df, VOCAB).collect()
    }
    for i, text in DOCS:
        want = py_encode(text)
        if not want:
            assert i not in got
        else:
            assert got[i] == (want, len(want)), i


def test_encode_corpus_order_is_document_order(spark):
    # many words, shuffled partitions: token order must follow word order
    text = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string").repartition(7)
    toks = encode_corpus(df, ["w"]).collect()[0]["tokens"]
    assert toks == [c for i in range(50) for c in ("w", *str(i))]


def test_trie_matcher_equals_spec():
    """greedy_tokenize_trie must segment identically to the O(len^2)
    spec on adversarial and random words."""
    import random

    from linkgraph.text.tokenize import build_trie, greedy_tokenize_trie

    vset = set(VOCAB)
    trie = build_trie(VOCAB)
    words = [
        "lower", "lowerick", "zzz", "thequickloweric", "newest",
        "", "l", "erer", "thethethe", "questwest",
    ]
    rng = random.Random(13)
    alphabet = "thelowernwsquick z"
    words += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 30)))
              for _ in range(300)]
    for w in words:
        assert greedy_tokenize_trie(w, trie) == greedy_tokenize_word(w, vset), w
