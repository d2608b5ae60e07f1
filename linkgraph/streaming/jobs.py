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


def streaming_sliding_counts(
    events: DataFrame,
    minutes: int = 60,
    slide_minutes: int = 15,
    watermark_minutes: int = 120,
) -> DataFrame:
    """Watermarked SLIDING-window counts (each event lands in
    window/slide overlapping windows) — the trending-detection shape.

    State is O(active windows x event types): each event updates
    minutes/slide_minutes windows, all map-side-combinable before the
    shuffle. Append mode: a window emits once, when the watermark
    passes its end.
    """
    w = F.window("ts", f"{minutes} minutes", f"{slide_minutes} minutes")
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def trending_types(
    sliding_counts: DataFrame, baseline_windows: int = 4
) -> DataFrame:
    """Batch post-pass over emitted sliding counts: per event type,
    each window's lift vs the trailing mean of the previous
    ``baseline_windows`` windows — the classic trending score. A
    window sort per type is bounded by the retention horizon, not
    history (upstream eviction already dropped old windows)."""
    from pyspark.sql import Window as W

    byt = (
        W.partitionBy("event_type")
        .orderBy("window_start")
        .rowsBetween(-baseline_windows, -1)
    )
    base = F.avg("n_events").over(byt)
    return sliding_counts.select(
        "window_start",
        "event_type",
        "n_events",
        F.round(base, 6).alias("baseline"),
        F.when(
            base > 0, F.round(F.col("n_events") / base, 6)
        ).alias("lift"),
    )
