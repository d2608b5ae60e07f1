"""Streaming dedup + incremental edge derivation vs their batch twins."""

from __future__ import annotations

import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

from linkgraph.ingest.corpus import synthetic_corpus
from linkgraph.ingest.derive import import_edges, module_index
from linkgraph.streaming.dedup import streaming_exact_dedup, streaming_import_edges
from linkgraph.streaming.jobs import run_available_now


def _ts(minutes: float):
    return datetime.fromtimestamp((1440 + minutes) * 60, tz=timezone.utc).replace(
        tzinfo=None
    )


def _write_slices(spark, tmp_path, name, slices, schema):
    """One parquet file per slice; mtime order drives trigger order."""
    out = str(tmp_path / name)
    for i, rows in enumerate(slices):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(out)
        time.sleep(1.1)  # distinct mtimes
    return out


def test_streaming_exact_dedup_first_seen_per_sha(spark, tmp_path):
    schema = "doc_id long, ingest_ts timestamp, text string"
    slices = [
        [(1, _ts(0), "alpha"), (2, _ts(1), "beta"), (3, _ts(2), "alpha")],
        [(4, _ts(10), "alpha"), (5, _ts(11), "gamma")],
    ]
    path = _write_slices(spark, tmp_path, "docs_in", slices, schema)
    docs = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    deduped = streaming_exact_dedup(docs, watermark="1 hour")
    run_available_now(
        deduped, "dedup_sink", str(tmp_path / "ck1"), output_mode="append"
    )
    rows = spark.table("dedup_sink").collect()
    # one survivor per distinct text; all duplicates within the horizon
    by_text = {}
    for r in rows:
        by_text.setdefault(r["text"], []).append(r["doc_id"])
    assert sorted(by_text) == ["alpha", "beta", "gamma"]
    assert all(len(v) == 1 for v in by_text.values())
    # the survivor is the first-arrived doc of its hash
    assert by_text["alpha"] == [1]


def test_streaming_import_edges_match_batch(spark, tmp_path):
    corpus = synthetic_corpus(spark, n_files=400, n_repos=40, partitions=4).cache()
    index = module_index(corpus).cache()
    index.count()
    want = {
        (r["src"], r["dst"]) for r in import_edges(corpus, index=index).collect()
    }
    assert want  # non-trivial fixture

    # replay the corpus as a 3-slice stream with an ingest timestamp
    schema = "repo string, path string, commit string, lang string, content string, ingest_ts timestamp"
    rows = corpus.collect()
    third = (len(rows) + 2) // 3
    slices = [
        [tuple(r) + (_ts(i),) for r in rows[i * third : (i + 1) * third]]
        for i in range(3)
    ]
    path = _write_slices(spark, tmp_path, "corpus_in", slices, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    edges = streaming_import_edges(stream, index, watermark="1 hour")
    run_available_now(
        edges, "edges_sink", str(tmp_path / "ck2"), output_mode="append"
    )
    got_rows = spark.table("edges_sink").collect()
    got = {(r["src"], r["dst"]) for r in got_rows}
    assert got == want
    # watermark dedup held: no (src, dst) emitted twice
    assert len(got_rows) == len(got)
    corpus.unpersist()
    index.unpersist()
