"""Structured Streaming layer: the events table as a stream.

The reference has no streaming constructs at all (SURVEY.md §2.3) —
this is new Layer-B capability: file-source streams, watermarked
tumbling/session windows, and streaming exact dedup, all composable
with the batch operators since Structured Streaming shares the
DataFrame API and Catalyst.
"""

from engine.streaming.events import (
    read_event_stream,
    streaming_dedup,
    streaming_session_windows,
    streaming_tumbling_counts,
    streaming_user_value_stats,
    streaming_view_purchase_join,
    run_available_now,
    write_stream_parquet,
)

__all__ = [
    "read_event_stream",
    "streaming_dedup",
    "streaming_session_windows",
    "streaming_tumbling_counts",
    "streaming_user_value_stats",
    "streaming_view_purchase_join",
    "run_available_now",
    "write_stream_parquet",
]
