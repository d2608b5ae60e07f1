"""Text analysis: token stats, quality, language ID, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.text import doc_fingerprint, language_id, quality_features, token_stats


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_stats(spark):
    df = token_stats(docs(spark, ["hello world", "a b  c", "", "don't stop"]))
    rows = {r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"]) for r in df.collect()}
    assert rows[0] == (2, 2)
    assert rows[1] == (3, 3)
    assert rows[2] == (0, 0)
    # don't stop -> ws: 2; bpe: don | ' | t | stop = 4
    assert rows[3] == (2, 4)


def test_quality_features_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and it is fine"
    bad = "!!! ??? ,,, ;;; @@@ ###"
    df = quality_features(docs(spark, [good, bad]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["quality_score"] > rows[1]["quality_score"]
    assert rows[0]["alpha_ratio"] > 0.7
    assert rows[1]["alpha_ratio"] == 0.0
    assert 0 <= rows[1]["quality_score"] <= 1


def test_language_id(spark):
    samples = {
        "en": "the cat is in the house and it is warm",
        "de": "der hund ist nicht in das haus und die katze",
        "fr": "le chien est dans la maison et les chats",
        "es": "el perro es una mascota y los gatos",
        "und": "zzz qqq xxx",
    }
    df = language_id(docs(spark, list(samples.values())))
    got = [r["lang_pred"] for r in df.orderBy("doc_id").collect()]
    assert got == list(samples.keys())


def test_fingerprint_robust_to_small_edit(spark):
    base = " ".join(f"w{i}" for i in range(100))
    edited = base.replace("w50", "EDIT")  # one word changed
    reordered = " ".join(f"w{i}" for i in reversed(range(100)))
    df = doc_fingerprint(docs(spark, [base, edited, reordered, base]))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[0]["fingerprint"] == rows[3]["fingerprint"]  # deterministic
    assert rows[0]["fingerprint"] != rows[2]["fingerprint"]  # different doc

    def overlap(i, j):
        a = set(rows[i]["fingerprint_sketch"])
        b = set(rows[j]["fingerprint_sketch"])
        return len(a & b) / max(len(a), len(b))

    # one edited word perturbs <= 5 of 96 shingles: the sketch keeps
    # most of its mass; a full reversal shares no 5-gram at all.
    assert overlap(0, 1) >= 0.5
    assert overlap(0, 2) == 0.0
    short = doc_fingerprint(docs(spark, ["tiny", "tiny", "other"]))
    fps = {r["doc_id"]: r["fingerprint"] for r in short.collect()}
    assert fps[0] == fps[1] != fps[2]


def test_runs_on_documents_parquet(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = doc_fingerprint(
        language_id(quality_features(token_stats(df)))
    )
    rows = out.limit(5).collect()
    assert len(rows) == 5
    assert {"n_tokens_ws", "quality_score", "lang_pred", "fingerprint"} <= set(
        out.columns
    )
