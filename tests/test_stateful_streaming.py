"""Parity: applyInPandasWithState sessionization vs batch sessionize.

Three time slices are written as separate file-source batches (mtime
order drives trigger order): slice A holds two sessions per user, B and
C are far-future activity whose only role is to advance the watermark
so A's open sessions hit their event-time timeout.

Deterministic assertions (independent of whether the engine runs a
final timeout-only batch after the last file):
- every emitted session is byte-identical to a batch-computed session;
- every slice-A session IS emitted (closed in-batch by the gap or by
  timeout once the watermark passed it);
- sessions the final watermark cannot have passed (slice C) are NOT
  emitted.
"""

from __future__ import annotations

import time
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from linkgraph.events import sessionize
from linkgraph.streaming.jobs import run_available_now, stream_events
from linkgraph.streaming.stateful import streaming_sessionize


BASE_MIN = 1440.0  # keep the timeline off epoch 0: rows with ts <= the
# initial watermark (0) are dropped as late by the stateful operator


def _ts(minutes: float):
    return datetime.fromtimestamp((BASE_MIN + minutes) * 60, tz=timezone.utc).replace(
        tzinfo=None
    )


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, _ts(m), u, "view", 0.0, "{}")
            for i, (m, u) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.mark.parametrize("gap_min,wm_min", [(30, 60)])
def test_stateful_sessionize_matches_batch(spark, tmp_path, gap_min, wm_min):
    # Slice A (minutes 0..55): two sessions per user, 40min apart (> gap).
    slice_a = [(m, u) for u in (1, 2, 3) for m in (0.0, 5.0, 10.0, 50.0, 55.0)]
    # Slices B and C: lone far-future events advancing the watermark.
    slice_b = [(600.0, 9)]
    slice_c = [(1200.0, 9)]

    events_dir = str(tmp_path / "events_in")
    for i, rows in enumerate((slice_a, slice_b, slice_c)):
        _events(spark, rows).coalesce(1).write.mode("append").parquet(events_dir)
        time.sleep(1.1)  # distinct mtimes: file-source processes in order

    streamed = streaming_sessionize(
        stream_events(spark, events_dir), gap_minutes=gap_min, watermark_minutes=wm_min
    )
    run_available_now(
        streamed, "sessions_out", str(tmp_path / "ckpt"), output_mode="append"
    )
    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_out").collect()
    }

    all_events = _events(spark, slice_a + slice_b + slice_c)
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(all_events, gap_minutes=gap_min)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect()
    }

    assert emitted <= batch
    expected_a = {
        (u, _ts(0.0), _ts(10.0), 3) for u in (1, 2, 3)
    } | {(u, _ts(50.0), _ts(55.0), 2) for u in (1, 2, 3)}
    assert expected_a <= emitted
    # slice C's session cannot have been passed by any watermark.
    assert (9, _ts(1200.0), _ts(1200.0), 1) not in emitted
