"""SparkSession construction tuned for the engine.

Local-mode defaults mirror what a cluster deploy would set per-job:
AQE on (runtime re-plan, skew-join handling, partition coalescing),
shuffle partitions sized to the parallelism actually available, UTC
session timezone (oracle comparability), Arrow enabled for the
Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl-rj-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real
    cluster the master/executor settings come from spark-submit; only
    the SQL-level configs below matter there.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*")
    if shuffle_partitions is None:
        shuffle_partitions = os.cpu_count() or 8 if cpus == "*" else int(cpus)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # write TimestampType as INT64 micros, not legacy INT96 — INT96
        # row groups carry no min/max statistics, so every clustered
        # layout's data skipping (sinks/layout.py) would silently die
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_session_defaults(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally provided
    session (the driver harness owns its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # TIMESTAMP(NANOS) parquet columns (e.g. testdata events.ts) read as
    # long nanos; sources.read_parquet_table converts them to micros.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # INT64-micros timestamp writes (INT96 has no row-group stats)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    return spark
