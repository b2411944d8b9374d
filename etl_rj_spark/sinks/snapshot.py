"""K2 — snapshot append: stamp every row with the load date and append
the full batch (cartera.py:179,185-196; pending_orders.py:167,174).

The sink table is partitioned by the snapshot column, so the
analysis layer's latest-snapshot filter (A4) becomes partition
pruning, and each day's load is one new partition directory — at
100 TB this is the difference between scanning one day and scanning
the table.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rj_spark.streaming.fsutil import has_visible_data, path_exists


def append_snapshot(
    df: DataFrame,
    path: str,
    snapshot_col: str = "fecha_carga",
    snapshot_date: datetime.date | None = None,
) -> DataFrame:
    """Stamp ``snapshot_col`` (today unless given) and append, partitioned
    by the snapshot column. Returns the stamped frame (lazily reusable)."""
    stamp = F.lit(snapshot_date) if snapshot_date is not None else F.current_date()
    stamped = df.withColumn(snapshot_col, stamp.cast("date"))
    stamped.write.mode("append").partitionBy(snapshot_col).parquet(path)
    # schema sidecar: a PARTITIONED write of a 0-row batch lands zero
    # files, so a table whose every snapshot was empty would be
    # unreadable (UNABLE_TO_INFER_SCHEMA). `_schema` is
    # underscore-prefixed — invisible to partition discovery — and a
    # plain 0-row parquet write there preserves the full schema for
    # ``read_latest_snapshot``'s fallback (r10 degenerate-input fix).
    # VALIDATED write-skip, not a bare existence check (ADVICE r11):
    # skipping on path_exists alone would leave a half-written sidecar
    # (interrupted first overwrite) broken forever and would pin the
    # first append's schema even after the table's schema evolved, so
    # the skip requires the sidecar to be READABLE and to match this
    # batch's columns/types; unreadable or drifted → rewrite. The
    # rewrite costs one extra 0-row job only on repair/evolution —
    # steady-state appends still skip it — and its brief last-writer-
    # wins absence window is covered by the same single-writer posture
    # as ``expire_snapshots`` (one orchestrator drives this sink).
    if _sidecar_needs_write(stamped, f"{path}/_schema"):
        stamped.limit(0).write.mode("overwrite").parquet(f"{path}/_schema")
    return stamped


def _sidecar_needs_write(batch: DataFrame, sidecar: str) -> bool:
    """True when the ``_schema`` sidecar is absent, unreadable, or no
    longer matches the batch's (name, type) shape. Nullability is
    ignored AT EVERY NESTING LEVEL: a parquet round-trip relaxes
    non-null flags both on top-level fields and INSIDE types
    (ArrayType.containsNull, MapType.valueContainsNull, inner struct
    fields), so the comparison uses a recursively-nullable normal form
    — comparing raw dataType flagged every append of a table with a
    non-null-element array column as drift, reintroducing the
    per-append sidecar job the validated skip exists to avoid
    (ADVICE r12)."""
    spark = batch.sparkSession
    if not path_exists(spark, sidecar):
        return True
    try:
        existing = spark.read.parquet(sidecar).schema
    except Exception:  # corrupt/partial sidecar — repair it
        return True

    def shape(schema):
        return [(f.name, _as_nullable(f.dataType)) for f in schema.fields]

    return shape(existing) != shape(batch.schema)


def _as_nullable(dt):
    """``dt`` with every nested nullability flag forced to True —
    parquet's round-trip normal form."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, _as_nullable(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_as_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_as_nullable(dt.keyType), _as_nullable(dt.valueType), True)
    return dt


def read_latest_snapshot(spark: SparkSession, path: str, snapshot_col: str = "fecha_carga") -> DataFrame:
    """A4 over a partitioned snapshot table with static partition
    pruning: the MAX over the partition column is resolved first — a
    scan that reads partition-directory values only, no data files —
    then the read filters on the literal, so the scan touches exactly
    one partition (PartitionFilters in the plan).

    For non-partitioned inputs use ``operators.aggregates.latest_snapshot``
    (the collect-free broadcast-max join).

    A table whose snapshots were all EMPTY (zero partition
    directories) reads back as a 0-row frame with the schema preserved
    by ``append_snapshot``'s ``_schema`` sidecar — not an inference
    error (r10 degenerate-input fix). The sidecar path is chosen by an
    EXPLICIT visible-files probe, never by catching exceptions around
    the read: a corrupt part-file footer, a permissions error, or a
    transient FS failure over a table that HAS data must fail loudly,
    not silently serve an empty snapshot (ADVICE r10, medium). The
    probe-then-read pair is not atomic; like every ledgered reader
    here it assumes the documented single-writer posture (ADVICE r11
    — see ``streaming/fsutil.read_state_or_schema``)."""
    if has_visible_data(spark, path) or not path_exists(spark, f"{path}/_schema"):
        df = spark.read.parquet(path)
    else:
        # zero partitions materialized — fall back to the sidecar
        return spark.read.parquet(f"{path}/_schema")
    latest = df.select(F.max(snapshot_col).alias("m")).first()[0]
    if latest is None:
        return df.limit(0)
    return df.filter(F.col(snapshot_col) == F.lit(latest))


def expire_snapshots(
    spark: SparkSession,
    path: str,
    keep: int,
    snapshot_col: str = "fecha_carga",
) -> list[str]:
    """Retention for the snapshot table: drop all but the newest
    ``keep`` snapshot partitions (directory deletes — no data rewrite,
    the partitioned layout makes retention a metadata-sized
    operation). Returns the dropped partition values; refuses
    ``keep < 1`` so the latest snapshot can never be expired.

    Single-writer posture like ``sinks/compact.py``: run from the
    orchestrator, never concurrently with a writer appending a new
    snapshot."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    prefix = f"{snapshot_col}="
    names = [
        st.getPath().getName()
        for st in fs.listStatus(root)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    ]

    # TYPED newest-first ordering: lexicographic names only order
    # correctly for fixed-width values (ISO dates); an int version
    # domain sorts '10' < '9' and would expire the NEWEST snapshot.
    # Parse every value as ISO date, else int, else fall back to
    # string — but only if ALL values agree on one interpretation.
    def key_fns():
        yield lambda v: datetime.date.fromisoformat(v)
        yield int
        yield str

    values = [n[len(prefix):] for n in names]
    for fn in key_fns():
        try:
            keyed = sorted(zip((fn(v) for v in values), names))
            break
        except ValueError:
            continue
    parts = [n for _k, n in keyed]
    drop = parts[:-keep] if keep < len(parts) else []
    for name in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/{name}"), True)
    return [d[len(prefix):] for d in drop]
