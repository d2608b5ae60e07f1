"""Streaming deduplication and incremental graph ingestion.

Two pipelines a training-data platform runs continuously, expressed as
Structured Streaming plans with bounded state:

- ``streaming_exact_dedup``: keep the FIRST-ARRIVED document per
  content hash. ``dropDuplicatesWithinWatermark`` holds one state row
  per distinct key seen inside the watermark horizon and evicts it once
  the watermark passes — state is O(distinct keys per horizon), not
  O(history), which is what lets this run forever over a 100 TB/day
  firehose. (Plain ``dropDuplicates`` on a stream never evicts.)
- ``streaming_import_edges``: incremental repo-dependency edge
  derivation. The parse + module resolution is a STATELESS projection
  plus a stream-static broadcast join against a precomputed module
  index (``ingest.derive.module_index`` — a slowly-changing dimension
  maintained in batch), so the only stateful operator is the same
  watermark-bounded dedup on the (src, dst) key. Batch parity: the
  emitted edge SET equals ``import_edges`` over the same corpus
  (pinned in tests/test_streaming_dedup.py).

Both run under ``Trigger.AvailableNow`` for CI/backfills (drain, then
stop) via ``streaming.jobs.run_available_now``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.ingest.derive import edge_candidates


def streaming_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ingest_ts",
    content_col: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen document per sha256(content) within the watermark.

    Emits the input columns plus ``content_sha``; duplicates arriving
    within ``watermark`` of the first occurrence are dropped, later
    re-occurrences (after state eviction) re-emit — the standard
    horizon-bounded dedup contract.
    """
    hashed = docs.withColumn("content_sha", F.sha2(F.col(content_col), 256))
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_sha"]
    )


def streaming_import_edges(
    corpus: DataFrame,
    index: DataFrame,
    ts_col: str = "ingest_ts",
    watermark: str = "1 hour",
    parser: str = "jvm",
) -> DataFrame:
    """Canonical (src, dst) dependency edges from a corpus stream.

    ``index`` must be a STATIC (module, repo) DataFrame — building it
    from the stream itself would need a stream-stream aggregation;
    maintaining it as a batch-refreshed dimension is the production
    shape. Edges repeat across micro-batches whenever two files import
    the same module, so the output is deduped on (src, dst) within the
    watermark horizon.
    """
    cands = edge_candidates(corpus, index, parser=parser, carry=[ts_col])
    return (
        cands.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["src", "dst"])
        .select("src", "dst")
    )
