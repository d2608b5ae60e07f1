"""Structured Streaming surface (scope extension; the reference is
batch-only — SURVEY.md §2.2 records no streaming operators)."""

from linkgraph.streaming.jobs import (
    stream_events,
    streaming_window_counts,
    run_available_now,
)

__all__ = ["stream_events", "streaming_window_counts", "run_available_now"]
