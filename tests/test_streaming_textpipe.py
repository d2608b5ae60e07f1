"""Streaming text-filter pipeline vs its batch twin on identical input."""

from __future__ import annotations

import time

from linkgraph.streaming.jobs import run_available_now
from linkgraph.streaming.textpipe import (
    DOCS_SCHEMA,
    stream_documents,
    text_filter_pipeline,
)

DOCS = [
    (1, "This line has five good words.\nshort.\nAnother fine sentence here now."
        "\nAnd a third full sentence arrives."),
    (2, "Lorem ipsum dolor sit amet filler.\nMore words follow here today."),
    (3, "Broken { code } doc with sentences. One more. And another."),
    (4, "Mail me at a.b@example.org right now please.\nSecond sentence is here"
        " too.\nThird full sentence closes it out."),
    (5, "no punctuation no sentences just words"),
]


def _rows(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_streaming_matches_batch(spark, tmp_path):
    path = str(tmp_path / "docs_in")
    # two slices with distinct mtimes -> two micro-batches
    for chunk in (DOCS[:3], DOCS[3:]):
        spark.createDataFrame(chunk, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(1.1)

    batch = text_filter_pipeline(
        spark.read.schema(DOCS_SCHEMA).parquet(path), min_words_per_line=4
    )
    streamed = text_filter_pipeline(
        stream_documents(spark, path), min_words_per_line=4
    )
    run_available_now(
        streamed, "textpipe_sink", str(tmp_path / "ck"), output_mode="append"
    )
    got = _rows(spark.table("textpipe_sink"))
    want = _rows(batch)
    assert got == want
    # doc 2 (lorem) and doc 3 (brace) and doc 5 (no sentences) are dropped
    assert set(got) == {1, 4}
    # PII was redacted in the cleaned text
    assert "<EMAIL>" in got[4]["text_redacted"]
    assert got[4]["n_emails"] == 1


def test_streaming_cm_sketch_matches_batch(spark, tmp_path):
    from linkgraph.streaming.textpipe import streaming_cm_sketch
    from linkgraph.text.sketch import cm_sketch

    path = str(tmp_path / "sk_in")
    for chunk in (DOCS[:2], DOCS[2:]):
        spark.createDataFrame(chunk, DOCS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(1.1)

    depth, width = 3, 32
    streamed = streaming_cm_sketch(
        stream_documents(spark, path), depth=depth, width=width
    )
    run_available_now(
        streamed, "cm_sink", str(tmp_path / "sk_ck"), output_mode="complete"
    )
    got = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in spark.table("cm_sink").collect()
    }
    want = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cm_sketch(
            spark.read.schema(DOCS_SCHEMA).parquet(path),
            depth=depth,
            width=width,
        ).collect()
    }
    assert got == want
    assert len(got) <= depth * width  # bounded state, vocab-independent


def test_streaming_bucket_counts_match_batch(spark, tmp_path):
    from linkgraph.streaming.textpipe import streaming_bucket_counts
    from linkgraph.text.drift import distribution_drift

    schema = "doc_id long, n_chars long"
    rows = [(i, 40 + 13 * (i % 37)) for i in range(200)]
    path = str(tmp_path / "drift_in")
    for chunk in (rows[:120], rows[120:]):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        time.sleep(1.1)

    ref = spark.createDataFrame(rows[:120], schema)
    lo, hi = ref.selectExpr(
        "min(cast(n_chars as double))", "max(cast(n_chars as double))"
    ).collect()[0]

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    run_available_now(
        streaming_bucket_counts(stream, lo, hi),
        "drift_sink",
        str(tmp_path / "drift_ck"),
        output_mode="complete",
    )
    got = {r["bucket"]: r["n"] for r in spark.table("drift_sink").collect()}

    full = spark.read.schema(schema).parquet(path)
    want = {
        r["bucket"]: r["n_ref"] + r["n_cur"]
        for r in distribution_drift(
            ref, full.join(ref, "doc_id", "left_anti"), "n_chars"
        ).collect()
        if r["n_ref"] + r["n_cur"] > 0
    }
    # batch drift buckets BOTH slices on ref bounds; the stream bucketed
    # ALL rows on the same bounds -> totals must agree bucket-by-bucket.
    assert got == want
    assert len(got) <= 10
