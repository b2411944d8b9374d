"""Parquet table source — the engine's default columnar scan (full
Catalyst pushdown/pruning), plus timestamp-encoding normalization.

Parquet writers emit timestamps in (at least) three encodings, and the
engine must present ONE type downstream (the reference normalizes all
datetimes before comparing/loading — ventas_totales.py:133,197; the
engine does the same at the source boundary):

- TIMESTAMP(MICROS, adjusted=UTC)  → Spark TimestampType: pass through.
- TIMESTAMP(MICROS, adjusted=false) → Spark TIMESTAMP_NTZ: cast to
  TimestampType. The session timezone is pinned to UTC (session.py), so
  the cast re-labels the same wall-clock instant — value-exact.
- TIMESTAMP(NANOS) → rejected by Spark unless
  ``spark.sql.legacy.parquet.nanosAsLong=true``, under which it reads
  as long nanos; convert by integer ``div 1000`` (truncation), matching
  what DuckDB does when it narrows ns → µs — the two engines then agree
  bit-for-bit on every timestamp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_timestamps(
    df: DataFrame, ns_timestamp_cols: Sequence[str] = ("ts",)
) -> DataFrame:
    """Normalize every timestamp encoding to plain TimestampType (µs,
    UTC session tz): TIMESTAMP_NTZ columns are cast (exact under the
    pinned UTC session timezone), and the named ``ns_timestamp_cols``
    that arrived as nanos-as-long are truncated to µs."""
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
        elif f.name in ns_timestamp_cols and isinstance(f.dataType, T.LongType):
            df = df.withColumn(
                f.name, F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
            )
    return df


def read_parquet_table(
    spark: SparkSession,
    path: str,
    ns_timestamp_cols: Sequence[str] = ("ts",),
) -> DataFrame:
    """Read a parquet table with all timestamp encodings normalized to
    TimestampType (see module docstring)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_timestamps(spark.read.parquet(path), ns_timestamp_cols)
