"""Running exact triangle count over an edge stream — incremental
maintenance under Structured Streaming.

Each micro-batch of newly-arrived edges is closed against the
ACCUMULATED edge table with ``graph.triangles.delta_triangles`` (cost
proportional to the batch, never a re-enumeration of history), then
appended to the state table. ``foreachBatch`` is the transactional
seam and EVERYTHING is keyed by batch id: batch N's edges land in
``edges/batch_id=N`` (overwrite) and its triangle count in
``counts/batch_id=N`` (overwrite), while "the graph before N" is
always the union of partitions ``batch_id < N``. A replayed batch
therefore recomputes from exactly the pre-N state and overwrites
exactly its own outputs — idempotent under the at-least-once replay
Structured Streaming guarantees after a failure, with no streaming
state store at all: the state is the engine's own canonical
partitioned edge table, and the running total is ``sum(n_new)`` over
the counts table.

Reference analogue: none (the reference recounts per run); this is the
composition the reference's own disk-checkpoint loop gestures at
(MaximalTruss.scala(flink):51-101) — durable intermediate tables as
iteration state — applied to a continuously-arriving graph.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.graph.edges import canonicalize
from linkgraph.graph.triangles import delta_triangles


def _prior_edges(
    spark: SparkSession, state_dir: str, batch_id: int
) -> DataFrame | None:
    """Union of edge partitions with batch_id < this batch (pruned scan)."""
    path = os.path.join(state_dir, "edges")
    try:
        df = spark.read.option("basePath", path).parquet(path)
    except Exception:  # noqa: BLE001 — first batch: no state yet
        return None
    return df.where(F.col("batch_id") < batch_id).select("src", "dst")


def apply_edge_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, state_dir: str
) -> int:
    """One incremental step: count new triangles, grow the edge state.

    Returns the number of triangles the batch created relative to all
    earlier batches. Deterministic in (earlier partitions, batch), so
    a replay writes byte-identical outputs over its own partitions.
    """
    edges_path = os.path.join(state_dir, "edges", f"batch_id={batch_id}")
    counts_path = os.path.join(state_dir, "counts", f"batch_id={batch_id}")
    delta = canonicalize(batch.select("src", "dst")).distinct()
    old = _prior_edges(spark, state_dir, batch_id)
    if old is None or not old.take(1):
        from linkgraph.graph.triangles import triangles

        new_tri = triangles(delta).count()
        fresh = delta
    else:
        old = old.localCheckpoint(eager=True)  # pin the pre-N snapshot
        new_tri = delta_triangles(old, delta).count()
        fresh = delta.join(old, ["src", "dst"], "left_anti")
    fresh.write.mode("overwrite").parquet(edges_path)
    spark.createDataFrame(
        [(int(new_tri),)], "n_new long"
    ).write.mode("overwrite").parquet(counts_path)
    return int(new_tri)


def streaming_triangle_count(
    edge_stream: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Start the incremental triangle-maintenance job (availableNow
    drains it for the batch-parity tests; drop the trigger for a
    continuous run)."""
    spark = edge_stream.sparkSession

    def fn(batch: DataFrame, batch_id: int) -> None:
        apply_edge_batch(spark, batch, batch_id, state_dir)

    return (
        edge_stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def accumulated_edges(spark: SparkSession, state_dir: str) -> DataFrame:
    """The canonical edge table accumulated so far (all batches)."""
    path = os.path.join(state_dir, "edges")
    return (
        spark.read.option("basePath", path)
        .parquet(path)
        .select("src", "dst")
        .distinct()
    )


def running_triangle_count(spark: SparkSession, state_dir: str) -> int:
    """Current total from the per-batch counts table."""
    counts = spark.read.parquet(os.path.join(state_dir, "counts"))
    return int(counts.agg(F.coalesce(F.sum("n_new"), F.lit(0))).collect()[0][0])
