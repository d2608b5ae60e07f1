"""Structured Streaming surface (scope extension; the reference is
batch-only — SURVEY.md §2.2 records no streaming operators)."""

from linkgraph.streaming.jobs import (
    stream_events,
    streaming_sliding_counts,
    streaming_window_counts,
    run_available_now,
    trending_types,
)
from linkgraph.streaming.stateful import streaming_sessionize
from linkgraph.streaming.dedup import streaming_exact_dedup, streaming_import_edges

__all__ = [
    "stream_events",
    "streaming_sliding_counts",
    "streaming_window_counts",
    "run_available_now",
    "trending_types",
    "streaming_sessionize",
    "streaming_exact_dedup",
    "streaming_import_edges",
]
