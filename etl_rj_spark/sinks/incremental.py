"""K1 — incremental batched append with anti-join dedup
(ventas_totales.py:223-262, wor2.py:236-245).

The reference pulls the fact table's key projection to the client,
builds an in-memory set, filters, then appends in 1,000-row
transactional batches. Here: the key projection is a column-pruned
scan of the sink table, the set-membership test is a ``left_anti``
join (broadcast or sort-merge per AQE), and the append is a parquet
(or JDBC) write.

Atomicity note (SURVEY §4): Spark JDBC commits per partition — the
reference's single-transaction semantics need ``numPartitions=1``
(small batches) or a staging-table commit; parquet appends are
atomic per-file with the default committer, and re-runs are
idempotent anyway because of the anti-join (Ventas PDF §9).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from etl_rj_spark.operators.dedup import anti_join_new_rows


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check via the Hadoop FS API (works
    for local, HDFS, s3a — wherever the sink lives)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs.exists(hpath)


def append_incremental(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: Sequence[str],
    on_null_key: str = "error",
) -> int:
    """Append only rows whose key tuple is not already in the sink.
    Returns the number of rows inserted (0 on re-run — the reference's
    recovery invariant)."""
    if _path_exists(spark, path):
        existing = spark.read.parquet(path).select(*keys)
        new = anti_join_new_rows(df, existing, keys, on_null_key=on_null_key)
    else:
        new = df
    new = new.cache()
    try:
        inserted = new.count()
        if inserted:
            new.write.mode("append").parquet(path)
    finally:
        new.unpersist()
    return inserted


def append_incremental_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    batchsize: int = 1000,
    properties: dict | None = None,
) -> None:
    """JDBC variant of K1: key projection pushed into the source query
    (column pruning at the database), 1,000-row JDBC batches like the
    reference, single partition for single-transaction-per-connection
    semantics. Live-tested against embedded Derby
    (tests/test_jdbc.py): 100-key-overlap batch inserts only the new
    50; re-run inserts 0."""
    spark = df.sparkSession
    existing = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT {', '.join(keys)} FROM {table}")
        .options(**(properties or {}))
        .load()
    )
    new = anti_join_new_rows(df, existing, keys)
    (
        new.coalesce(1)
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .options(**(properties or {}))
        .mode("append")
        .save()
    )
