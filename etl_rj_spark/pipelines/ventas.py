"""Entry point 1 — incremental sales-fact load (SURVEY §3,
ventas_totales.py): CSV/Excel export → rename/typed → dim lookup with
unmapped reporting → key normalization → anti-join dedup → batched
append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rj_spark.functions import norm_lower, parse_date, parse_plain_money
from etl_rj_spark.operators import dim_lookup, rename_map
from etl_rj_spark.operators.filters import drop_null_rows
from etl_rj_spark.operators.joins import unmapped_rows
from etl_rj_spark.sinks.incremental import append_incremental

#: ventas_totales.py:107-119 — source-header → warehouse-column map.
VENTAS_RENAME = {
    "Company Name": "nombre_cliente",
    "Date": "fecha_raw",
    "Document Number": "document_number",
    "Type": "tipo",
    "Item": "item",
    "Description": "descripcion",
    "Class": "clase",
    "Quantity": "cantidad_producto",
    "UOM": "presentacion",
    "Amount": "amount",
    "Created From": "created_from",
}

#: ventas_totales.py:169 — composite dedup key.
VENTAS_DEDUP_KEYS = ["id_cliente", "fecha", "document_number", "item"]


def clean_ventas(df: DataFrame, clientes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Clean + enrich a sales export. Returns (facts, unmapped_names):
    facts ready to dedup/append; unmapped client names for the
    operational report (ventas_totales.py:154-156).

    Key normalization (ventas_totales.py:186-203) happens here — int
    cast, trimmed strings, date-truncated fecha — so the dedup keys
    are non-null and comparable (SURVEY §4 null-key delta)."""
    df = df.drop("Status")                             # P1
    df = rename_map(df, VENTAS_RENAME)                 # P2
    df = df.withColumns(
        {
            # comma/$-tolerant lenient parse (r9 review fix): the same
            # export family uses thousands separators (pending's
            # Quantity does), and a bare double cast silently NULLed
            # '1,234.56' — the reference passes the raw value to the DB
            # where a bad value at least errors loudly
            "amount": parse_plain_money("amount"),     # N1
            "cantidad_producto": parse_plain_money("cantidad_producto"),
            "fecha": parse_date("fecha_raw", "M/d/yyyy"),  # D1/D3
        }
    ).drop("fecha_raw")

    dim = clientes.select(
        norm_lower("nombre_cliente").alias("__name_key"), "id_cliente"
    )                                                   # X1
    probe = df.withColumn("__name_key", norm_lower("nombre_cliente"))
    enriched = dim_lookup(probe, dim, "__name_key")     # J2 (broadcast left)
    unmapped = unmapped_rows(enriched, "id_cliente").select("nombre_cliente").distinct()  # A1

    facts = (
        drop_null_rows(enriched, ["id_cliente", "fecha"])          # F1
        .withColumns(
            {
                "id_cliente": F.col("id_cliente").cast("int"),     # N3
                "document_number": F.trim(F.col("document_number").cast("string")),
                "item": F.trim(F.col("item").cast("string")),
            }
        )
        .drop("__name_key", "nombre_cliente")                      # P1
    )
    return facts, unmapped


def load_ventas(
    spark: SparkSession, df: DataFrame, clientes: DataFrame, warehouse_path: str
) -> tuple[int, DataFrame]:
    """Full incremental load: returns (rows_inserted, unmapped_names).
    Re-running the same file inserts 0 (Ventas PDF §9)."""
    facts, unmapped = clean_ventas(df, clientes)
    # null-safe key matching (r9 review fix): the reference dedups on
    # astype(str) fingerprints, so a NULL document_number/item row
    # loads and dedups like any other — the default on_null_key='error'
    # aborted the whole re-run load the first time a dirty export
    # carried an empty key cell
    inserted = append_incremental(
        spark, facts, warehouse_path, VENTAS_DEDUP_KEYS, on_null_key="match"
    )
    return inserted, unmapped


def load_ventas_observed(
    spark: SparkSession, df: DataFrame, clientes: DataFrame, warehouse_path: str
) -> tuple[int, DataFrame, dict]:
    """``load_ventas`` with in-flight metrics via ``DataFrame.observe``
    — the reference's progress counters (``len(df)`` at
    ventas_totales.py:215-216 and the non-numeric diagnostics at
    127-128) collected as a side effect of the sink action instead of
    extra full passes. Each reference ``len(df)``/``isna().sum()`` was
    another scan of the in-memory frame; at 100 TB every extra pass is
    a table scan, so counters must ride the write.

    Returns (rows_inserted, unmapped_names, metrics) where metrics has
    ``rows_in`` (raw rows entering), ``rows_valid`` (facts surviving
    cleaning), ``amount_nonnumeric`` (cells N1 coerced to null), and
    ``amount_total`` (exact-cents sum of the valid facts).
    """
    from pyspark.sql import Observation

    obs_in = Observation("ventas_in")
    df = df.observe(obs_in, F.count(F.lit(1)).alias("rows_in"))

    facts, unmapped = clean_ventas(df, clientes)

    obs_valid = Observation("ventas_valid")
    facts = facts.observe(
        obs_valid,
        F.count(F.lit(1)).alias("rows_valid"),
        F.sum(F.when(F.col("amount").isNull(), 1).otherwise(0)).alias("amount_nonnumeric"),
        (F.sum(F.round(F.col("amount") * 100).cast("long")) / F.lit(100.0)).alias(
            "amount_total"
        ),
    )
    # null-safe key matching (r9 review fix): the reference dedups on
    # astype(str) fingerprints, so a NULL document_number/item row
    # loads and dedups like any other — the default on_null_key='error'
    # aborted the whole re-run load the first time a dirty export
    # carried an empty key cell
    inserted = append_incremental(
        spark, facts, warehouse_path, VENTAS_DEDUP_KEYS, on_null_key="match"
    )
    metrics = {**obs_in.get, **obs_valid.get}
    return inserted, unmapped, metrics


def read_sales_export(spark: SparkSession, path: str) -> DataFrame:
    """Extension dispatch (ventas_totales.py:80-90): .csv → header CSV
    scan [S1]; .xlsx/.xls → whole-first-sheet Excel scan [S3]. The
    reference pops an error dialog for anything else; here it raises.
    A true legacy BIFF .xls (OLE2 magic) gets a clear convert-to-xlsx
    error from ``read_excel_sheet`` instead of an opaque zip failure;
    zip-content files mislabeled .xls still load."""
    lower = path.lower()
    if lower.endswith(".csv"):
        return spark.read.option("header", True).csv(path)
    if lower.endswith((".xlsx", ".xls")):
        from etl_rj_spark.sources.excel_tables import read_excel_sheet

        return read_excel_sheet(spark, path)
    raise ValueError(f"unsupported sales export format: {path}")


def read_clientes_dim(spark: SparkSession, config) -> DataFrame:
    """The Clientes dimension via a :class:`~etl_rj_spark.config.
    DbConfig` — the reference's fixed dimension read
    (ventas_totales.py:40,137: SELECT from Clientes on the configured
    connection), projection pushed to the database [S5]."""
    from etl_rj_spark.sources.jdbc import read_dim_table

    return read_dim_table(
        spark,
        config.jdbc_url(),
        config.clientes_table,
        ["id_cliente", "nombre_cliente", "id_zone"],
        config.jdbc_properties(),
    )


def load_ventas_jdbc(df: DataFrame, clientes: DataFrame, config) -> DataFrame:
    """``load_ventas`` against the configured warehouse database
    instead of a parquet path — K1's JDBC form driven by a
    :class:`~etl_rj_spark.config.DbConfig` (the reference's .env-fed
    connection + fixed Ventas_Totales destination,
    ventas_totales.py:16-41,223-262). Returns the unmapped-client
    report; insert idempotence comes from the in-sink anti-join."""
    from etl_rj_spark.sinks.incremental import append_incremental_jdbc

    facts, unmapped = clean_ventas(df, clientes)
    append_incremental_jdbc(
        facts,
        config.jdbc_url(),
        config.ventas_table,
        VENTAS_DEDUP_KEYS,
        properties=config.jdbc_properties(),
        on_null_key="match",  # reference dedups astype(str) fingerprints
    )
    return unmapped
