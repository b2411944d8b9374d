"""SQL API surface: register the testdata star schema as temp views so
every engine capability is reachable through ``spark.sql`` — Catalyst
produces the same plans either way, so the DataFrame op library and
the SQL surface are one engine, not two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_rj_spark.sources.parquet import read_parquet_table

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (ns-timestamp
    normalization applied, same as the DataFrame path)."""
    for t in TABLES:
        read_parquet_table(spark, f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def sql(spark: SparkSession, query: str) -> DataFrame:
    return spark.sql(query)
