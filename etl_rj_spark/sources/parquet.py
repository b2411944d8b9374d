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

``nanosAsLong`` is deliberately set SESSION-WIDE (not set-and-restore):
the returned DataFrame is lazy, so the flag must still hold whenever a
downstream action finally executes the scan — a restore on return
would make later evaluations fail with PARQUET_TYPE_ILLEGAL. This is
the documented mechanism that lets a vanilla SparkSession (no custom
builder config) read the nanos-encoded events table; the session-flag
contract is written up in SCALE.md §5b.
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


def _footer_declares_nanos(path: str, col: str) -> bool | None:
    """Probe one local parquet footer: True/False if ``col``'s logical
    type is/isn't TIMESTAMP(NANOS); None when no local footer can be
    read (object-store path, empty dir) — caller falls back to the
    documented name-based default. The footer is the ONLY place the
    nanos encoding is still visible once ``nanosAsLong`` has already
    turned the Spark-side type into a plain long."""
    import glob as _glob
    import os

    if os.path.isfile(path):
        candidates = [path]
    elif os.path.isdir(path):
        candidates = sorted(_glob.glob(os.path.join(path, "*.parquet")))[:1]
    else:
        return None
    if not candidates:
        return None
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_schema(candidates[0]).field(col).type
        return pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:  # missing col, unreadable footer → can't say
        return None


def read_parquet_table(
    spark: SparkSession,
    path: str,
    ns_timestamp_cols: Sequence[str] = ("ts",),
) -> DataFrame:
    """Read a parquet table with all timestamp encodings normalized to
    TimestampType (see module docstring).

    A named ns column that comes back LongType is AMBIGUOUS — genuine
    longs (epoch-millis, counters) are schema-identical to
    nanos-as-long. Where a local footer is readable the logical type
    disambiguates (a genuine long column named ``ts`` passes through
    untouched instead of being silently mangled into ~1970
    timestamps); where it isn't (object store), the name-based default
    stands as the documented contract — pass ``()`` for generic
    tables."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    cols = []
    for c in ns_timestamp_cols:
        field = next((f for f in df.schema.fields if f.name == c), None)
        if field is None or not isinstance(field.dataType, T.LongType):
            continue
        if _footer_declares_nanos(path, c) is False:
            continue  # genuine long column: leave it alone
        cols.append(c)
    return normalize_timestamps(df, cols)
