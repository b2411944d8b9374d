"""Entry point 2b — pending-orders daily snapshot (SURVEY §3,
pending_orders.py): junk-trimmed CSV → rename incl. flexible status
column → temporal dims with 1900-01-01 default → dim join → truncation
and thousands-separator cleanup → snapshot append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rj_spark.functions import (
    clean_customer_name,
    date_default,
    parse_date_lenient,
    parse_int_thousands,
    parse_plain_money_default,
    temporal_dims,
    truncate,
)
from etl_rj_spark.operators import dim_lookup, first_present_column, rename_map
from etl_rj_spark.operators.filters import drop_null_rows
from etl_rj_spark.operators.joins import unmapped_rows

#: pending_orders.py:66-73 — trailing-space headers.
PENDING_RENAME = {
    "Customer ": "nombre_cliente",
    "Amount (Net) ": "amount_net_raw",
    "Document Number ": "document_number",
    "Date ": "fecha_raw",
    "Class Item ": "class_item",
    "Quantity ": "cantidad_raw",
}

#: pending_orders.py:74-77 — the status column varies by export.
ESTADO_CANDIDATES = ["Validated Status ", "Status "]

FINAL_COLUMNS = [
    "id_cliente", "class_item", "cantidad", "amount_net", "document_number",
    "estado", "fecha", "id_zone", "nombre_mes", "mes", "dia", "anio",
]


def _enrich(df: DataFrame, clientes: DataFrame) -> DataFrame:
    """Shared front half: rename → defaults/temporal dims → dim join.
    A status-less export loads with NULL estado — the reference only
    renames/keeps the column when present (pending_orders.py:74-77,
    158) and inserts fine without it, so erroring here diverged (r9
    review fix)."""
    try:
        estado_src = first_present_column(df, ESTADO_CANDIDATES)
        df = rename_map(df, {**PENDING_RENAME, estado_src: "estado_raw"})
    except ValueError:
        df = rename_map(df, PENDING_RENAME).withColumn(
            "estado_raw", F.lit(None).cast("string")
        )

    fecha = date_default(parse_date_lenient("fecha_raw"))      # D2+D4
    dims = temporal_dims(fecha)                                # D6
    df = df.withColumns(
        {
            "class_item": F.coalesce(F.col("class_item"), F.lit("Descuento")),  # N2
            "fecha": fecha,
            "nombre_mes": dims["nombre_mes"],
            "mes": dims["mes"],
            "dia": dims["dia"],
            "anio": dims["anio"],
        }
    )

    dim = clientes.select(
        clean_customer_name("nombre_cliente").alias("__name_key"), "id_cliente", "id_zone"
    )
    probe = df.withColumn("__name_key", clean_customer_name("nombre_cliente"))
    return dim_lookup(probe, dim, "__name_key")                # J1


def _finish(enriched: DataFrame) -> DataFrame:
    """Shared back half: casts, defaults, truncation, final projection."""
    return (
        enriched.withColumns(
            {
                "id_cliente": F.col("id_cliente").cast("int"),
                "id_zone": F.coalesce(F.col("id_zone"), F.lit(1)).cast("int"),  # N6 default zone
                "cantidad": F.coalesce(parse_int_thousands("cantidad_raw"), F.lit(0)),  # N4+N2
                # plain $/, strip — pending has NO accounting parens
                # (that's cartera's open_balance; r9 review fix)
                "amount_net": parse_plain_money_default("amount_net_raw"),
                # strip FIRST, then truncate (pending_orders.py:146,149
                # does .str.strip().str[:20] — a padded value truncates
                # to a different string otherwise; r9 review fix)
                "document_number": truncate(F.trim(F.col("document_number").cast("string")), 20),  # X7
                "estado": truncate(F.trim(F.col("estado_raw").cast("string")), 50),                # X7
            }
        )
        .select(*FINAL_COLUMNS)
    )


def clean_pending_orders(df: DataFrame, clientes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (snapshot_rows, unmapped_names)."""
    enriched = _enrich(df, clientes)
    unmapped = unmapped_rows(enriched, "id_cliente").select("nombre_cliente").distinct()
    return _finish(drop_null_rows(enriched, ["id_cliente"])), unmapped


def clean_pending_orders_quarantined(
    df: DataFrame, clientes: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """``clean_pending_orders`` with a dead-letter channel instead of a
    silent drop/default: returns (snapshot_rows, quarantine). Quarantine
    rows keep their RAW source columns plus a ``reasons`` array saying
    why each row was rejected (unmapped client; unparseable raw date or
    quantity — values the standard path silently defaults). The
    reference only prints these diagnostics to the console
    (pending_orders.py:116, SURVEY §5); at warehouse scale the
    quarantine table is the reprocessing queue, and the valid side is
    strictly clean (no defaulted dates/quantities)."""
    from etl_rj_spark.operators.validate import quarantine_split

    enriched = _enrich(df, clientes)
    rules = {
        "client_unmapped": F.col("id_cliente").isNotNull(),
        "fecha_invalid": F.col("fecha_raw").isNull()
        | parse_date_lenient("fecha_raw").isNotNull(),
        "cantidad_invalid": F.col("cantidad_raw").isNull()
        | parse_int_thousands("cantidad_raw").isNotNull(),
    }
    ok, quarantine = quarantine_split(enriched, rules)
    return _finish(ok), quarantine
