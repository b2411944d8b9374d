"""S5/S6 — JDBC dimension and key-projection reads
(ventas_totales.py:141-143, 176-181; wor2.py:232-233).

The reference pulls dimension tables and fact-key projections to the
client over pymssql. Here both are Spark JDBC reads with the
projection/predicate pushed into the ``query`` option, so the database
does the pruning (the reference hand-writes the same optimization —
SURVEY §4).

Live-tested against embedded Apache Derby (bundled in the Spark
distribution) — tests/test_jdbc.py drives projection pushdown, WHERE
pushdown, and the partitioned fan-out read against a real SQL
database in-JVM; pipelines use parquet dimensions (TESTDATA.md).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_dim_table(
    spark: SparkSession,
    url: str,
    table: str,
    columns: Sequence[str],
    properties: dict | None = None,
) -> DataFrame:
    """S5 — dimension read with the projection pushed into the query
    (``SELECT id_cliente, nombre_cliente, id_zone FROM Clientes``)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("query", f"SELECT {', '.join(columns)} FROM {table}")
        .options(**(properties or {}))
        .load()
    )


def read_key_projection(
    spark: SparkSession,
    url: str,
    table: str,
    keys: Sequence[str],
    predicate: str | None = None,
    properties: dict | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """S6 — dedup key projection (``SELECT <keys> FROM <fact> [WHERE
    ...]``). For large fact tables pass partition_column/bounds so the
    read parallelizes across ``num_partitions`` JDBC connections
    instead of one cursor (the at-scale posture; the reference
    single-streams this, BASELINE.md dedup-cost row)."""
    where = f" WHERE {predicate}" if predicate else ""
    projection = f"SELECT {', '.join(keys)} FROM {table}{where}"
    reader = spark.read.format("jdbc").option("url", url).options(**(properties or {}))
    wants_fanout = bool(num_partitions) or partition_column is not None
    if wants_fanout:
        # fail loudly on a half-specified fan-out: a None bound would
        # reach the JVM as an opaque NPE, and a partition_column with
        # no num_partitions would silently fall back to ONE cursor —
        # the caller asked for a parallel read and must get one
        if not (num_partitions and partition_column is not None):
            raise ValueError(
                "partitioned JDBC read needs BOTH num_partitions and "
                "partition_column"
            )
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partitioned JDBC read needs lower_bound and upper_bound "
                f"(got {lower_bound!r}, {upper_bound!r})"
            )
        # Spark rejects query+partitionColumn together — the fanned-out
        # read must ship the projection as a dbtable subquery alias
        # (each of the numPartitions cursors appends its own bound
        # predicate against the alias).
        reader = (
            reader.option("dbtable", f"({projection}) T")
            .option("numPartitions", num_partitions)
            .option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
        )
    else:
        reader = reader.option("query", projection)
    return reader.load()
