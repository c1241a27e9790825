"""Structured Streaming surface: windowed aggregations with watermarks,
session windows, stateful dedup — the streaming twins of the batch
operators (SURVEY §2.8: the reference has no event streaming; this is
engine surface beyond it)."""

from .windows import (
    tumbling_counts,
    sliding_counts,
    session_counts,
    streaming_dedup,
    run_stream_to_memory,
)

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_counts",
    "streaming_dedup",
    "run_stream_to_memory",
]
