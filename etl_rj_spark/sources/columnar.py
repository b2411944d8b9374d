"""ORC read/write (+ capability-gated Avro) — alternate columnar
interchange formats beside the default parquet scan.

The reference ingests CSV/Excel/JDBC only (ventas_totales.py:70-113);
ORC support is a Spark-first extension for warehouse interchange:
Spark's native ORC datasource (orc-core on every Spark classpath)
carries the same Catalyst contract as parquet — predicate pushdown,
column pruning, partition pruning — so a 100 TB ORC lake scans with
identical plan shapes to the parquet path (`tests/test_orc.py` pins
PushedFilters on the ORC scan).

Timestamps: Spark writes ORC timestamps as TIMESTAMP_INSTANT-less
`timestamp` (local) by default; under the engine's pinned UTC session
timezone a write→read roundtrip is value-exact, and any TIMESTAMP_NTZ
columns coming from foreign writers are normalized at the boundary by
the same helper the parquet source uses (sources/parquet.py).

Avro: the `spark-avro` connector module is NOT bundled with a stock
pyspark install (only avro-core is). `avro_available()` probes the
session's classpath; read/write raise a clear CapabilityError when the
connector is absent instead of surfacing Spark's opaque
ClassNotFoundException mid-plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from etl_rj_spark.sources.parquet import normalize_timestamps


class CapabilityError(RuntimeError):
    """A datasource this build of Spark does not carry."""


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    compression: str = "zstd",
) -> None:
    """Write ``df`` as ORC. zstd keeps parity with the parquet sink's
    codec choice; ``partition_by`` gives directory-level partition
    pruning exactly as for parquet."""
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
    if partition_by:
        # a PARTITIONED write of a 0-row frame lands zero files, which
        # makes the table unreadable (UNABLE_TO_INFER_SCHEMA) — keep
        # the schema in an underscore-hidden sidecar, exactly like the
        # parquet snapshot sink (r10 degenerate-input sweep fix)
        df.limit(0).write.mode("overwrite").orc(f"{path}/_schema")


def read_orc(
    spark: SparkSession,
    path: str,
    ns_timestamp_cols: Sequence[str] = (),
) -> DataFrame:
    """Read an ORC table with the source-boundary timestamp discipline
    shared with the parquet source: TIMESTAMP_NTZ → TimestampType under
    the pinned UTC session tz.

    ``ns_timestamp_cols`` defaults EMPTY (unlike the parquet reader):
    ORC has no nanos-as-long encoding — that parquet path exists only
    under ``spark.sql.legacy.parquet.nanosAsLong`` — so a LongType
    column named ``ts`` in an ORC table is ordinary data; mangling it
    by default (``div 1000`` + timestamp_micros) would silently corrupt
    e.g. an epoch-milliseconds column. Pass names explicitly only for
    tables KNOWN to store raw nanosecond longs.

    A partitioned table whose every write was EMPTY reads back as a
    0-row frame via the ``_schema`` sidecar ``write_orc`` leaves — not
    an inference error (r10 degenerate-input fix). The sidecar path is
    chosen by an EXPLICIT probe, never by catching
    ``AnalysisException`` around the read: a never-written path must
    propagate PATH_NOT_FOUND with the ORIGINAL path (non-partitioned
    tables have no sidecar at all, so the old retry produced a
    misleading secondary error), and a real analysis error over a
    populated table must fail loudly (ADVICE r10)."""
    from etl_rj_spark.streaming.fsutil import has_visible_data, path_exists

    if has_visible_data(spark, path) or not path_exists(spark, f"{path}/_schema"):
        df = spark.read.orc(path)
    else:
        df = spark.read.orc(f"{path}/_schema")
    return normalize_timestamps(df, ns_timestamp_cols)


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro connector resolves on this classpath.

    Probes with Spark's own datasource lookup (ServiceLoader over
    DataSourceRegister) — NOT ``Class.forName``: spark-sql ships a
    stub ``o.a.s.sql.avro.AvroFileFormat`` purely to raise the
    "external module" guidance, so the class resolving proves nothing.
    """
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", spark._jsparkSession.sessionState().conf()
        )
        return True
    except Exception:
        return False


_AVRO_MSG = (
    "the spark-avro connector is not on this Spark classpath; add "
    "org.apache.spark:spark-avro_<scala>:<spark-version> via "
    "spark.jars.packages to enable Avro read/write"
)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    if not avro_available(df.sparkSession):
        raise CapabilityError(_AVRO_MSG)
    df.write.mode(mode).format("avro").save(path)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    if not avro_available(spark):
        raise CapabilityError(_AVRO_MSG)
    return spark.read.format("avro").load(path)
