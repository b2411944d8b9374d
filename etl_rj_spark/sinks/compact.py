"""Small-file compaction — operational hygiene for append-heavy sinks.

Daily snapshot/incremental appends (K1/K2) accumulate one file set per
run; after months a partition holds hundreds of small files and every
scan pays per-file open cost. ``compact_partition`` rewrites one
partition to ``target_files`` files via coalesce (no shuffle) and swaps
it in atomically-enough for a single-writer warehouse (write to a temp
dir, then replace). At true scale run it per-partition from an
orchestrator; never compact the partition a writer is appending to.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def compact_partition(
    spark: SparkSession,
    table_path: str,
    partition: str,
    target_files: int = 1,
) -> int:
    """Rewrite ``table_path/partition`` (e.g. ``fecha_carga=2024-01-10``)
    into ``target_files`` parquet files. Returns the row count (used to
    verify the rewrite before the swap)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(f"{table_path}/{partition}")
    fs = src.getFileSystem(conf)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{table_path}/.compact-{partition.replace('/', '_')}")

    df = spark.read.parquet(str(src))
    n = df.count()
    df.coalesce(target_files).write.mode("overwrite").parquet(str(tmp))
    rewritten = spark.read.parquet(str(tmp)).count()
    if rewritten != n:
        fs.delete(tmp, True)
        raise RuntimeError(f"compaction row-count mismatch: {rewritten} != {n}")
    fs.delete(src, True)
    # Hadoop FileSystem.rename reports most failures by returning
    # false, not raising — an unchecked false here would silently lose
    # the partition (src deleted, rewrite stranded in the dot-dir that
    # every scan ignores)
    if not fs.rename(tmp, src):
        raise RuntimeError(
            f"compaction swap failed: rename({tmp}, {src}) returned false — "
            f"rewritten data stranded in {tmp}, live partition deleted"
        )
    return n
