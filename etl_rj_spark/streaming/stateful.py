"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the pattern for operators whose state
outlives a microbatch — the streaming twin of
``operators.windows.sessionize``).

Per user, state carries the open session (start, last-seen, count,
value sum) as int64 epoch-micros + counters. Each batch sorts its
events, closes and emits every session whose gap elapsed, and leaves
the trailing session open in state.

Two closing disciplines for that trailing session:

- :func:`streaming_sessionize` — closed only by a later batch's gap
  (state lives until the user reappears; simplest, watermark-free).
- :func:`streaming_sessionize_with_timeout` — ALSO closed by an
  EventTimeTimeout: the state registers ``last_seen + gap`` as its
  timeout; once the WATERMARK passes it, Spark invokes the function
  with ``state.hasTimedOut`` and the session is emitted and the state
  dropped. This is the production posture — per-user state is bounded
  by activity + gap, not by stream lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState

SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)
SESSION_STATE_SCHEMA = "start long, last long, n long, vsum double"


def _make_sessionizer(gap_seconds: int, close_on_timeout: bool = False):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if close_on_timeout and state.hasTimedOut:
            start, last, n, vsum = state.get
            state.remove()
            if n:
                out = pd.DataFrame(
                    [(user_id, start, last, n, vsum)],
                    columns=["user_id", "session_start", "session_end",
                             "n_events", "value_sum"],
                )
                out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
                out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
                yield out
            return
        start, last, n, vsum = state.get if state.exists else (None, None, 0, 0.0)

        closed: list[tuple] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            # unit-independent epoch-µs: Arrow may hand pandas ns- or
            # µs-resolution datetimes depending on the source encoding
            ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            for t, v in zip(ts_us.tolist(), batch["value"].tolist()):
                if last is not None and t - last > gap_us:
                    closed.append((user_id, start, last, n, vsum))
                    start, n, vsum = None, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                vsum += v
        state.update((start, last, n, vsum))
        if close_on_timeout and last is not None:
            # EventTimeTimeout keys on the WATERMARK: fire once it
            # passes this session's gap horizon (ms epoch). A timeout
            # timestamp ≤ the watermark raises
            # INVALID_TIMEOUT_TIMESTAMP and kills the whole query, so
            # clamp the horizon just past the current watermark.
            # On this engine (Spark 4) the clamp is defense-in-depth
            # rather than load-bearing: stateful-operator late-record
            # eviction drops input rows older than the watermark
            # before they reach this function (verified empirically —
            # a 2-hours-late straggler never invokes the sessionizer),
            # so ``last`` ≥ watermark whenever new data arrives and the
            # unclamped horizon already clears it. The clamp keeps the
            # operator safe on runtimes/configs without that eviction.
            horizon_ms = last // 1000 + gap_seconds * 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(horizon_ms, wm_ms + 1))

        if closed:
            out = pd.DataFrame(
                closed, columns=["user_id", "session_start", "session_end", "n_events", "value_sum"]
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return fn


def streaming_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Emit closed sessions per user as the stream progresses. Input
    needs (user_id, ts, event_id, value)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )


def streaming_sessionize_with_timeout(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Like :func:`streaming_sessionize`, but trailing sessions are
    ALSO emitted once the event-time watermark passes their gap
    horizon — no user left permanently open. Input needs
    (user_id, ts, event_id, value); ``ts`` carries the watermark."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_seconds, close_on_timeout=True),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )
