"""Gap sessionization on ``transformWithStateInPandas`` — Spark 4's
successor to ``applyInPandasWithState`` (SPARK-49560 "Arbitrary
Stateful Processing v2": named state variables, timers, TTL, and a
processor object instead of a closure). Semantics are IDENTICAL to
``streaming/stateful.py``'s sessionizer; the test pins both APIs to
the same closed-session output so the engine can migrate users from
the v1 API without behavior change.

Requires the RocksDB state store provider (transformWithState does
not run on the default HDFS-backed provider):

    spark.conf:  spark.sql.streaming.stateStore.providerClass =
        org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from etl_rj_spark.streaming.stateful import (
    SESSION_OUTPUT_SCHEMA,
    SESSION_STATE_SCHEMA,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def transform_with_state_available() -> bool:
    """The v2 API's dedicated Python runner imports google.protobuf at
    startup (state-server wire protocol); without it the runner exits
    -2 and the query fails with STREAMING_PYTHON_RUNNER_INITIALIZATION_
    FAILURE. Capability-gate callers the way the Avro source gates on
    Spark's datasource lookup."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class SessionizeProcessor(StatefulProcessor):
    """Open-session state per user (start/last epoch-µs + counters),
    closing and emitting sessions whose gap elapsed — the v2 twin of
    ``stateful._make_sessionizer``."""

    def __init__(self, gap_seconds: int = 1800):
        self._gap_us = gap_seconds * 1_000_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("open_session", SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        got = self._state.get()
        start, last, n, vsum = got if got is not None else (None, None, 0, 0.0)

        closed: list[tuple] = []
        batch = pd.concat(list(rows), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            ts_us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            for t, v in zip(ts_us.tolist(), batch["value"].tolist()):
                if last is not None and t - last > self._gap_us:
                    closed.append((user_id, start, last, n, vsum))
                    start, n, vsum = None, 0, 0.0
                if start is None:
                    start = t
                last = t
                n += 1
                vsum += v
        self._state.update((start, last, n, vsum))

        if closed:
            out = pd.DataFrame(
                closed,
                columns=[
                    "user_id", "session_start", "session_end",
                    "n_events", "value_sum",
                ],
            )
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    def close(self) -> None:
        pass


def streaming_sessionize_v2(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Emit closed sessions per user via the v2 stateful API. Input
    needs (user_id, ts, event_id, value)."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionizeProcessor(gap_seconds),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
