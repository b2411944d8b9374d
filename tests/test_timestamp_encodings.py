"""Timestamp-encoding robustness at the source boundary.

Parquet writers emit timestamps three ways — TIMESTAMP(MICROS,
adjusted=UTC), TIMESTAMP(MICROS, adjusted=false) (Spark TIMESTAMP_NTZ),
and TIMESTAMP(NANOS) (Spark long-nanos under the legacy flag). A
testdata regeneration switched encodings between rounds and silently
broke sessionization, as-of joins, and all three streaming twins —
these tests pin that the batch reader AND the stream reader normalize
every encoding to the same TimestampType values.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from etl_rj_spark.operators.windows import sessionize
from etl_rj_spark.sources.parquet import read_parquet_table
from etl_rj_spark.streaming.events import read_event_stream

UTC = datetime.timezone.utc
ROWS = [
    # (event_id, epoch_us, user_id, value) — two users; user 1 has a
    # >1800 s gap so sessionize must see exact µs values to split it
    (1, 1_700_000_000_000_000, 1, 1.0),
    (2, 1_700_000_000_500_000, 1, 2.0),  # +0.5 s: same session
    (3, 1_700_001_800_500_001, 1, 3.0),  # +1800.000001 s after #2
    (4, 1_700_000_000_000_000, 2, 4.0),
]
EPOCH_US = [r[1] for r in ROWS]


def _write(tmp_path, name, ts_type):
    # int→timestamp cast interprets the integer in the TARGET unit
    scale = 1000 if ts_type.unit == "ns" else 1
    ts = pa.array([u * scale for u in EPOCH_US], type=pa.int64()).cast(ts_type)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "value": pa.array([r[3] for r in ROWS], pa.float64()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")
    return str(d)


@pytest.fixture()
def encoded_dirs(tmp_path):
    return {
        "us_utc": _write(tmp_path, "us_utc", pa.timestamp("us", tz="UTC")),
        "us_ntz": _write(tmp_path, "us_ntz", pa.timestamp("us")),
        "ns": _write(tmp_path, "ns", pa.timestamp("ns")),
    }


def test_batch_reader_normalizes_all_encodings(spark, encoded_dirs):
    for name, path in encoded_dirs.items():
        df = read_parquet_table(spark, path)
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), name
        got = sorted(
            r.ts.replace(tzinfo=UTC).timestamp() * 1_000_000 for r in df.collect()
        )
        assert got == sorted(EPOCH_US), name


def test_stream_reader_matches_batch_per_encoding(spark, encoded_dirs, tmp_path):
    for name, path in encoded_dirs.items():
        stream = read_event_stream(spark, path)
        assert isinstance(stream.schema["ts"].dataType, T.TimestampType), name
        q = (
            stream.writeStream.format("memory")
            .queryName(f"enc_{name}")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.event_id, r.ts) for r in spark.sql(f"SELECT * FROM enc_{name}").collect()
        }
        expected = {
            (r.event_id, r.ts) for r in read_parquet_table(spark, path).collect()
        }
        assert got == expected, name


def test_sessionize_runs_on_every_encoding(spark, encoded_dirs):
    for name, path in encoded_dirs.items():
        df = read_parquet_table(spark, path)
        out = sessionize(df, "user_id", "ts", 1800, tiebreak_col="event_id")
        sessions = {
            (r.user_id, r.event_id): r.session_id for r in out.collect()
        }
        # user 1's third event is >1800 s after the second → new session
        assert sessions[(1, 1)] == 1 and sessions[(1, 2)] == 1, name
        assert sessions[(1, 3)] == 2, name
        assert sessions[(2, 4)] == 1, name


def test_genuine_long_ts_column_passes_through(spark, tmp_path):
    """r9 review fix: a column NAMED ts whose parquet logical type is a
    plain int64 (epoch-millis, a counter) must NOT be mangled by the
    nanos-as-long truncation — the footer disambiguates what the
    Spark-side schema cannot."""
    from pyspark.sql import types as T

    p = str(tmp_path / "longs.parquet")
    spark.createDataFrame(
        [(1, 1_700_000_000_000), (2, 7)], "id long, ts long"
    ).write.parquet(p)
    got = read_parquet_table(spark, p)
    assert isinstance(got.schema["ts"].dataType, T.LongType)
    assert {(r.id, r.ts) for r in got.collect()} == {
        (1, 1_700_000_000_000), (2, 7)
    }
