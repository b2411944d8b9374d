"""Parquet table source — the engine's default columnar scan (full
Catalyst pushdown/pruning), plus nanosecond-timestamp normalization.

Spark rejects parquet TIMESTAMP(NANOS) columns unless
``spark.sql.legacy.parquet.nanosAsLong=true``, under which they read as
long nanos. We convert to TimestampType by integer ``div 1000``
(truncation), matching what DuckDB does when it narrows ns → µs — the
two engines then agree bit-for-bit on every timestamp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_parquet_table(
    spark: SparkSession,
    path: str,
    ns_timestamp_cols: Sequence[str] = ("ts",),
) -> DataFrame:
    """Read a parquet table, converting known nanos-as-long timestamp
    columns back to TimestampType (µs, truncated)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_timestamp_cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
