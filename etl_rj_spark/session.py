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

#: Runtime-settable SQL defaults shared by :func:`get_spark` and
#: :func:`ensure_session_defaults` — join-strategy posture (guide §3.1
#: / §9), r15: allow the planner to pick a shuffled-hash join when its
#: size conditions hold instead of always sorting both sides, and let
#: AQE rewrite a sort-merge join to shuffled-hash at runtime when every
#: post-shuffle partition fits a bounded local map. A hash build skips
#: the two per-partition sorts — measured −6 % across the heavy bench
#: joins (array-carrying verify joins benefit most: sorting rows with
#: ~100-element set payloads just to equi-join ids is pure overhead).
#: OOM-guard scope, stated precisely (ADVICE r15): the 128m
#: local-map threshold bounds ONLY the AQE sort-merge→shuffled-hash
#: rewrite, which is runtime-size-based; the STATIC shuffled-hash
#: selection that preferSortMergeJoin=false additionally enables is
#: guarded by optimizer size ESTIMATES (muchSmaller: build side
#: ≤ plannedSize/3 and ≤ autoBroadcastJoinThreshold ×
#: numShufflePartitions), which can be wrong after filters/UDFs — a
#: misestimated build side has no sort-merge fallback. On this
#: engine's workloads every static-SHJ-eligible build side is a
#: dimension/sliver relation (the big array-payload verify joins
#: reach SHJ via the AQE rewrite, which IS capped); deployments that
#: cannot vouch for their estimates should set
#: SPARK_GRAFT_PREFER_SMJ=true to keep the static planner on
#: sort-merge and rely solely on the capped AQE rewrite.
#: Join strategy never changes results, only plans.
_JOIN_DEFAULTS = {
    "spark.sql.join.preferSortMergeJoin": os.environ.get(
        "SPARK_GRAFT_PREFER_SMJ", "false"
    ),
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
        "SPARK_GRAFT_SHJ_LOCAL_MAP", "128m"
    ),
}


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
    for k, v in _JOIN_DEFAULTS.items():
        builder = builder.config(k, v)
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
    # join-strategy posture (see _JOIN_DEFAULTS): plan-only, results
    # identical — applied here so externally owned sessions (the driver
    # harness) run the same physical strategy the engine benches
    for k, v in _JOIN_DEFAULTS.items():
        spark.conf.set(k, v)
    return spark
