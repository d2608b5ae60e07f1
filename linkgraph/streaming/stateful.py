"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState``.

The batch ``linkgraph.events.sessionize`` (gaps-and-islands window
function) cannot run incrementally — a window over all of a user's
history is unbounded state. The streaming form keeps exactly ONE open
session per user as explicit state and emits a session the moment it
closes, with event-time timeouts flushing sessions whose gap expires
without further events:

- state per user: (session_start_ms, last_ts_ms, n_events) of the open
  session only — O(users) state, independent of history length;
- arriving events (Arrow batches, vectorized per group) fold into the
  open session, closing and emitting every session whose gap is
  exceeded inside the batch;
- an event-time timeout at last_ts + gap fires when the watermark
  passes it: the open session is emitted and the state cleared, so
  state size stays bounded even for users who disappear.

Semantics parity with the batch operator is pinned in
tests/test_stateful_streaming.py: every emitted session equals the
batch-computed session byte-for-byte; sessions still open at
end-of-input are exactly the batch sessions the final watermark has not
passed yet.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_ms long, last_ms long, n long"


def _session_fold(gap_ms: int):
    """Build the per-group stateful kernel (closure over the gap)."""

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []  # (start_ms, end_ms, n)

        if state.hasTimedOut:
            # Watermark passed last_ts + gap: the open session is final.
            if state.exists:
                start_ms, last_ms, n = state.get
                closed.append((start_ms, last_ms, n))
            state.remove()
        else:
            if state.exists:
                start_ms, last_ms, n = state.get
            else:
                start_ms = last_ms = -1
                n = 0
            # One group may span several Arrow chunks: gather the whole
            # micro-batch, sort by event time once, then fold.
            chunks = [pdf["ts"] for pdf in pdfs if not pdf.empty]
            if chunks:
                ts = (
                    (pd.concat(chunks).astype("int64") // 1_000_000)
                    .sort_values()
                    .to_numpy()
                )  # ns -> ms, event-time order
                for t in ts:
                    t = int(t)
                    if n == 0:
                        start_ms, last_ms, n = t, t, 1
                    elif t - last_ms > gap_ms:
                        closed.append((start_ms, last_ms, n))
                        start_ms, last_ms, n = t, t, 1
                    else:
                        last_ms = max(last_ms, t)
                        n += 1
            if n > 0:
                state.update((start_ms, last_ms, n))
                state.setTimeoutTimestamp(last_ms + gap_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="ms") for s, _, _ in closed
                    ],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return fold


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_minutes: int = 60,
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) of CLOSED sessions.

    ``events`` is a streaming DataFrame with (ts, user_id, ...); output
    is append-mode: one row per session, emitted when the session
    closes (gap exceeded by a later event, or event-time timeout).
    """
    return (
        events.withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fold(gap_minutes * 60 * 1000),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
