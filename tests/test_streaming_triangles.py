"""Incremental streaming triangle count: availableNow drain == batch
recount; replayed batches are idempotent."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkgraph.graph.triangles import triangle_count
from linkgraph.streaming.triangles import (
    apply_edge_batch,
    running_triangle_count,
    streaming_triangle_count,
)
from tests.conftest import edge_df

EDGE_SCHEMA = T.StructType(
    [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
)


def _chunks(seed=7, n=30, p=0.2, parts=3):
    rng = random.Random(seed)
    pairs = [
        (i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < p
    ]
    rng.shuffle(pairs)
    k = len(pairs) // parts
    return [pairs[i * k : (i + 1) * k if i < parts - 1 else len(pairs)]
            for i in range(parts)]


def test_streamed_count_equals_batch_recount(spark, tmp_path):
    chunks = _chunks()
    src_dir = tmp_path / "in"
    src_dir.mkdir()
    for i, chunk in enumerate(chunks):
        edge_df(spark, chunk).coalesce(1).write.parquet(str(src_dir / f"f{i}"))
    # one file dir per trigger: the parquet file source reads leaf files;
    # point it at the flattened file list via recursiveFileLookup
    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    state = str(tmp_path / "state")
    q = streaming_triangle_count(stream, state, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    total = running_triangle_count(spark, state)
    every = [p for c in chunks for p in c]
    assert total == triangle_count(edge_df(spark, every))
    # edge state is the exact canonical union, no duplicates
    from linkgraph.streaming.triangles import accumulated_edges

    st = accumulated_edges(spark, state)
    assert st.count() == len(set(every))


def test_replayed_batch_is_idempotent(spark, tmp_path):
    state = str(tmp_path / "state")
    b0 = edge_df(spark, [(1, 2), (2, 3), (1, 3)])
    b1 = edge_df(spark, [(3, 4), (1, 4)])
    n0 = apply_edge_batch(spark, b0, 0, state)
    n1 = apply_edge_batch(spark, b1, 1, state)
    # b0 closes (1,2,3); b1's (3,4)+(1,4) close (1,3,4) via old (1,3)
    assert (n0, n1) == (1, 1)
    # replay batch 1 (same id, same data — the failure/retry case):
    # recomputed against the pre-1 state, overwrites its own partition
    n1b = apply_edge_batch(spark, b1, 1, state)
    assert n1b == 1
    assert running_triangle_count(spark, state) == 2
    from linkgraph.streaming.triangles import accumulated_edges

    st = accumulated_edges(spark, state)
    assert st.count() == 5
