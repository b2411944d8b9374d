"""Structured Streaming surface.

The reference is batch-only (daily manual loads, Ventas PDF §9), so
parity needs no streaming — but the engine exposes the natural
streaming forms of its operators (SURVEY §2.9 note):

- snapshot loads as a file-source stream with ``Trigger.AvailableNow``
  (each run drains new files exactly once — the daily-load cadence,
  minus the human),
- the windowed/sessionized event aggregations as watermarked streaming
  queries built from the *same expressions* as their batch oracles.
"""

from etl_rj_spark.streaming.events import (  # noqa: F401
    read_event_stream,
    stream_snapshot_append,
    windowed_event_counts_stream,
)
from etl_rj_spark.streaming.incremental import stream_incremental_append  # noqa: F401
