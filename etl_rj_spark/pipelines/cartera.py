"""Entry point 2a — accounts-receivable daily snapshot (SURVEY §3,
cartera.py): junk-trimmed CSV → rename (trailing-space headers) →
e-commerce reclassification → cleaned-name dim join → money parse →
snapshot-stamped full append.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rj_spark.functions import (
    clean_customer_name,
    iso_format,
    parse_date_lenient,
    parse_money_default,
    recode_values,
)
from etl_rj_spark.operators import dim_lookup, rename_map
from etl_rj_spark.operators.filters import drop_null_rows
from etl_rj_spark.operators.joins import unmapped_rows

#: cartera.py:77-85 — headers carry trailing spaces in the export.
CARTERA_RENAME = {
    "Zones for Financial Reporting ": "zona",
    "Customer:Project ": "nombre_cliente",
    "Transaction Type ": "tipo_transaccion",
    "Date ": "fecha_facturacion_raw",
    "Document Number ": "document_number",
    "Due Date ": "fecha_pago_raw",
    "Open Balance ": "open_balance_raw",
}

CARTERA_DROP = ["P.O. No. ", "Age "]  # cartera.py:89

FINAL_COLUMNS = [
    "id_cliente", "id_zone", "tipo_transaccion", "fecha_facturacion",
    "document_number", "fecha_pago", "open_balance",
]


def clean_cartera(df: DataFrame, clientes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Returns (snapshot_rows, unmapped_names). Snapshot rows carry no
    load stamp — ``append_snapshot`` adds ``fecha_carga``."""
    df = rename_map(df, CARTERA_RENAME).drop(*CARTERA_DROP)

    # F4+X6 — e-commerce reclassification (cartera.py:101-108). Two
    # DISTINCT branches, reference literals verbatim: Walmart+Ecommerce
    # rewrites the client name to 'Walmart Ecommerce', Amazon+Ecommerce
    # to 'Amazon'; both send zona to 'E-Commerce'. Both conditions are
    # evaluated against the ORIGINAL columns (the reference precomputes
    # condicion_1/condicion_2 before either np.where fires; they are
    # mutually exclusive on zona so a single two-way CASE is identical).
    cond_walmart = (F.trim("zona") == "Walmart") & (F.trim("nombre_cliente") == "Ecommerce")
    cond_amazon = (F.trim("zona") == "Amazon") & (F.trim("nombre_cliente") == "Ecommerce")
    df = df.withColumns(
        {
            "zona": F.when(cond_walmart | cond_amazon, F.lit("E-Commerce")).otherwise(F.col("zona")),
            "nombre_cliente": F.when(cond_walmart, F.lit("Walmart Ecommerce"))
            .when(cond_amazon, F.lit("Amazon"))
            .otherwise(F.col("nombre_cliente")),
        }
    )
    # X5 — placeholder recode, applied AFTER the rewrite as in the
    # reference (cartera.py:110)
    df = df.withColumn(
        "nombre_cliente",
        recode_values("nombre_cliente", {"- no customer/project -": "Sin Nombre"}),
    )

    # X3 both sides + J1 broadcast left join (cartera.py:118-122)
    dim = clientes.select(
        clean_customer_name("nombre_cliente").alias("__name_key"), "id_cliente", "id_zone"
    )
    probe = df.withColumn("__name_key", clean_customer_name("nombre_cliente"))
    enriched = dim_lookup(probe, dim, "__name_key")
    unmapped = unmapped_rows(enriched, "id_cliente").select("nombre_cliente").distinct()

    out = (
        drop_null_rows(enriched, ["id_cliente"])                         # F1
        .withColumns(
            {
                "id_cliente": F.col("id_cliente").cast("int"),           # N3
                # N6 — DB zone else CSV zone (cartera.py:124; id_zone is
                # a string column in the Cartera schema, Cartera PDF §2)
                "id_zone": F.coalesce(F.col("id_zone").cast("string"), F.trim("zona")),
                # X4+N2 — accounting money → double, junk → 0
                "open_balance": parse_money_default("open_balance_raw"),
                # D2+D5 — lenient parse, invalid → null
                "fecha_facturacion": iso_format(parse_date_lenient("fecha_facturacion_raw")).cast("date"),
                "fecha_pago": iso_format(parse_date_lenient("fecha_pago_raw")).cast("date"),
            }
        )
        .select(*FINAL_COLUMNS)                                          # P4
    )
    return out, unmapped
