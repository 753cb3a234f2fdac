"""Structured Streaming surface for the event operators.

The reference has no streaming (SURVEY.md §2 — all streaming rows
N/A); this is the pipeline-side addition: the SAME transformations as
ops/events.py run under readStream → writeStream with a watermark for
late data. Batch/stream parity comes from sharing the transformation
functions — Structured Streaming's incrementalization is Catalyst's
job, not ours.
"""

from .stream import streaming_windowed_counts, run_streaming_once
from .stateful import (
    streaming_sessionize,
    streaming_dedup_events,
    streaming_distinct_users,
    run_events_stream_once,
)

__all__ = [
    "streaming_windowed_counts",
    "run_streaming_once",
    "streaming_sessionize",
    "streaming_dedup_events",
    "streaming_distinct_users",
    "run_events_stream_once",
]
