"""File-manifest incremental ingest: process only files not yet in a
persisted processed-files ledger — the FILE-level counterpart of the
row-level K1 anti-join (`sinks/incremental.py`).

At 100 TB the unit of arrival is the file (a drop directory, an
exported shard, a log segment): re-scanning the whole corpus to
anti-join rows is wasted I/O when the delta is "these 40 new files".
The ledger records which files have been processed; each run reads
ONLY the complement, and recording is itself anti-joined so
redelivery (crash between ingest and record, double-triggered runs)
converges instead of double-processing.

Contracts:
- Listing is filesystem METADATA (names via globStatus), never data.
- The listed-minus-ledger diff runs as a DataFrame anti-join (a
  billion-file ledger never materializes on the driver); only the NEW
  names — bounded by the arrival batch, not corpus size — collect to
  drive the read.
- `record_processed` appends names with an anti-join against the
  ledger, so recording the same batch twice is a no-op (same
  idempotence class as the K1 sink).
- Crash-ordering: record AFTER the downstream write commits. A crash
  before recording re-processes the batch next run — safe when the
  downstream sink is itself idempotent (K1 anti-join / snapshot
  overwrite), which is this engine's sink posture everywhere.
- SINGLE WRITER (ADVICE r7): the pending→process→record cycle is
  idempotent under sequential redelivery but NOT under concurrency —
  two simultaneous runs both see the same files as pending and both
  process them (duplicate ledger rows; duplicate output unless the
  downstream sink dedups, which the K1 sink does). Run one ingest at
  a time per ledger — the natural posture for a scheduled job; guard
  ad-hoc runs with an external lock/marker if overlap is possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LEDGER_SCHEMA = "file_path string"


def list_files(spark: SparkSession, pattern: str) -> list[str]:
    """All FILES matching a Hadoop glob pattern (metadata-only listing;
    directories are skipped). Returns fully-qualified URIs — the same
    strings the ledger stores, so diffs are exact."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    statuses = fs.globStatus(path)
    return sorted(
        s.getPath().toString() for s in (statuses or []) if s.isFile()
    )


def _read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(ledger_path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(p):
        return spark.read.parquet(ledger_path)
    return spark.createDataFrame([], _LEDGER_SCHEMA)


def pending_files(
    spark: SparkSession, pattern: str, ledger_path: str
) -> list[str]:
    """Files matching ``pattern`` that the ledger has NOT recorded, in
    sorted order. The diff is a DataFrame anti-join (ledger side never
    collects); the result is batch-sized by construction."""
    listed = list_files(spark, pattern)
    if not listed:
        return []
    listed_df = spark.createDataFrame([(f,) for f in listed], _LEDGER_SCHEMA)
    new = listed_df.join(
        _read_ledger(spark, ledger_path), "file_path", "left_anti"
    )
    return sorted(r.file_path for r in new.collect())


def record_processed(
    spark: SparkSession, ledger_path: str, files: list[str]
) -> int:
    """Append ``files`` to the ledger, anti-joined against it first so
    re-recording is a no-op. Returns the number of NEWLY recorded
    names. Call AFTER the downstream write commits (see module
    docstring for the crash-ordering contract)."""
    if not files:
        return 0
    batch = spark.createDataFrame([(f,) for f in files], _LEDGER_SCHEMA)
    fresh = batch.join(
        _read_ledger(spark, ledger_path), "file_path", "left_anti"
    ).persist()
    n = fresh.count()
    if n:
        # single metadata-sized file per batch; the ledger stays a
        # names-only table, compact it with the snapshot retention
        # tooling if batches are tiny and frequent
        fresh.coalesce(1).write.mode("append").parquet(ledger_path)
    fresh.unpersist()
    return n


def ingest_new_files(
    spark: SparkSession,
    pattern: str,
    ledger_path: str,
    fmt: str = "parquet",
    **options,
) -> tuple[DataFrame | None, list[str]]:
    """One incremental ingest step: (DataFrame over only-new files
    stamped with ``_source_file``, the new file list) — or
    ``(None, [])`` when nothing is new. The caller writes downstream,
    THEN calls :func:`record_processed` with the returned list."""
    new = pending_files(spark, pattern, ledger_path)
    if not new:
        return None, []
    df = spark.read.format(fmt).options(**options).load(new)
    return df.withColumn("_source_file", F.input_file_name()), new
