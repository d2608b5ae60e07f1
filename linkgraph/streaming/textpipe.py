"""Streaming ingestion-time text filtering: the batch text layer
(C4 rules, quality scores, PII redaction, token stats) re-run unchanged
under readStream.

A training-data pipeline scores and scrubs documents AS THEY ARRIVE
(crawl drops land continuously); because every operator in
linkgraph.text is a stateless per-row Catalyst projection, the exact
batch logical plan replays under Structured Streaming with no state
store, no watermark, and append output — each micro-batch is one fused
whole-stage-codegen pass, trivially resumable from the sink checkpoint.
Batch/stream parity is therefore a framework guarantee (same plan, same
engine); the test pins it anyway per the repo's streaming discipline
(availableNow drain vs batch run on identical input).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linkgraph.schemas import T
from linkgraph.text.c4 import c4_filters
from linkgraph.text.analysis import quality_features, token_stats
from linkgraph.text.pii import pii_features, redact_pii

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of documents parquet files."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def text_filter_pipeline(
    docs: DataFrame,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Score, filter, and scrub a document stream (or batch frame —
    the same plan serves both).

    Output: surviving documents only (C4 keep verdict), with cleaned
    text, PII-redacted text, quality/token columns, and PII counts.
    """
    out = c4_filters(
        docs, min_words_per_line=min_words_per_line, min_sentences=min_sentences
    )
    out = out.where("keep_doc")
    out = token_stats(out)
    out = quality_features(out)
    out = pii_features(out)
    out = redact_pii(out, col="text_clean", out_col="text_redacted")
    return out.select(
        "doc_id",
        "text_clean",
        "text_redacted",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "n_tokens_ws",
        "n_tokens_bpe",
        "quality_score",
        "n_emails",
        "n_ipv4",
        "n_phones",
    )


def streaming_cm_sketch(
    docs: DataFrame, col: str = "text", depth: int = 4, width: int = 256
) -> DataFrame:
    """Running Count-Min sketch over a document stream.

    The batch sketch (text/sketch.py::cm_sketch) is one additive
    aggregate keyed by (row, bucket), so under Structured Streaming it
    becomes a running frequency summary with PERFECTLY BOUNDED state:
    at most depth*width counter rows in the state store, independent
    of vocabulary size and stream length — the property that makes
    Count-Min the standard streaming frequency structure. `complete`
    output re-emits the full (tiny) sketch each micro-batch; estimates
    join the latest emission exactly as in the batch path. No
    watermark: counters are cumulative by design, nothing expires.
    """
    from linkgraph.text.sketch import cm_sketch

    return cm_sketch(docs, col=col, depth=depth, width=width)


def streaming_bucket_counts(
    docs: DataFrame,
    lo: float,
    hi: float,
    col: str = "n_chars",
    n_buckets: int = 10,
) -> DataFrame:
    """Running drift-bucket counts of a numeric column over a stream.

    The streaming half of text/drift.py: the REFERENCE slice is static
    by definition, so its bounds arrive as two driver scalars (no
    stream-static join), and the stream reduces to one additive
    aggregate with state bounded by n_buckets rows — the same
    bounded-state argument as streaming_cm_sketch. Drain the sink and
    feed the counts to the batch PSI/KL tail for the verdict.
    """
    from pyspark.sql import functions as F

    x = F.col(col).cast("double")
    if hi > lo:
        b = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.floor((x - F.lit(lo)) / F.lit(hi - lo) * n_buckets).cast(
                    "int"
                ),
            ),
        )
    else:
        b = F.lit(0)
    return (
        docs.where(x.isNotNull())
        .select(b.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
