"""Structured Streaming jobs over the events table.

The batch logical plans in ``linkgraph.events`` re-run unchanged under
``readStream``: tumbling-window aggregation gets a watermark for late
data, and the file source replays the same parquet the batch path
reads — the lambda-architecture-free pattern Structured Streaming is
built around.

Tested with ``Trigger.AvailableNow`` (drain everything, then stop) so
the pipeline's streaming semantics — watermarking, state store, append
vs update output — execute for real in CI without a long-lived job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.schemas import T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of events parquet files."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def streaming_window_counts(
    events: DataFrame, minutes: int = 60, watermark_minutes: int = 120
) -> DataFrame:
    """Watermarked tumbling-window counts; append-mode compatible.

    The watermark bounds state: windows older than the watermark are
    finalized and evicted, so state size is O(active windows), not
    O(history) — the property that makes this run forever at scale.
    """
    w = F.window("ts", f"{minutes} minutes")
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def run_available_now(
    streamed: DataFrame,
    sink_table: str,
    checkpoint_dir: str,
    output_mode: str = "complete",
) -> None:
    """Drain the stream into an in-memory sink table and stop.

    ``availableNow`` processes every available input in bounded batches
    with full state/watermark semantics, then terminates — the batch-
    parity harness for streaming jobs (and the pattern for backfills).
    ``complete`` output keeps windows visible that a watermark would not
    have finalized by end-of-input; production append-mode sinks emit
    only finalized windows.
    """
    q = (
        streamed.writeStream.format("memory")
        .queryName(sink_table)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
