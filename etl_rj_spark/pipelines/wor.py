"""Entry point 3 — WOR workbook multi-table load (SURVEY §3, wor2.py):
regex-discovered named tables → per-kind cleaning → zone/product
recodes → UNION ALL per group → anti-join dedup per target table.

Tables arrive pre-extracted (sources.excel_tables); each carries
name-derived metadata columns (zone, nombre_mes, mes, anio) and a
``_row_idx`` source-row index for the order-dependent drop-first-row
step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_rj_spark.functions import norm_upper, recode_values, to_number_default
from etl_rj_spark.operators import rename_map, union_all_by_name
from etl_rj_spark.operators.filters import (
    drop_leading_rows,
    drop_null_rows,
    rows_where_no_column_contains,
)
from etl_rj_spark.operators.projection import rename_positional, select_present

#: The reference's static zone map, VERBATIM (wor2.py:50-62) — keys are
#: the normalized spaced form produced by wor2.py:274-283
#: (``Zone1`` token → ``"Zone 1"`` key; Kam tokens pass through).
#: ``Zone 7`` / ``E-Commerce`` / ``Outlet & Donation`` are unreachable
#: from workbook table names (the discovery regex at wor2.py:104-107
#: only admits Zone1-6|KamEast|KamCentral) but are shipped for parity.
ZONE_MAPPING = {
    "Zone 1": 1, "Zone 2": 2, "Zone 3": 3, "Zone 4": 4, "Zone 5": 5,
    "Zone 6": 6, "Zone 7": 7, "KamCentral": 8, "KamEast": 9,
    "E-Commerce": 10, "Outlet & Donation": 11,
}

#: Backwards-compat alias (pre-round-7 name); same object.
ZONE_IDS = ZONE_MAPPING

#: The reference's static product map, VERBATIM (wor2.py:36-48) —
#: shipped as the engine default for ``clean_category_tables`` so a
#: reference user needs no caller-supplied map.
PRODUCTO_MAPPING = {
    "Ricky Joy Yogurt": 1,
    "Mellow Cones": 2,
    "Crazy Legs": 3,
    "Ricky Joy Gels": 4,
    "Jelly Fruits": 5,
    "Plis": 6,
    "SSC Roll On": 7,
    "Freeze Dried": 8,
    "3D Gummies": 9,
    "SC Gel": 10,
    "Cotton Candy": 11,
}

WEEK_RENAME = {
    "WEEK 1": "semana_1", "WEEK 2": "semana_2", "WEEK 3": "semana_3",
    "WEEK 4": "semana_4", "WEEK 5": "semana_5",
}

FORECAST_KEYS = ["id_cliente", "id_zone", "mes", "anio"]       # wor2.py:341
CUOTA_KEYS = ["id_zone", "mes", "anio"]                        # wor2.py:231-232
CATEGORY_KEYS = ["id_producto", "id_zone", "mes", "anio"]      # wor2.py:389


def _with_zone_id(df: DataFrame) -> DataFrame:
    """J3 — zone-token recode with default id 1 (wor2.py:213,330).

    The extracted token (``Zone1``..``Zone6`` | ``KamEast`` |
    ``KamCentral``) is first normalized to the reference's spaced key
    form — ``Zone1`` → ``"Zone 1"`` — exactly as wor2.py:274-283 does
    before ``Series.map(ZONE_MAPPING)``; unmapped keys default to 1
    per the reference's ``.fillna(1)`` (wor2.py:213,330,430).
    """
    normalized = F.regexp_replace("zone", r"^Zone(\d+)$", r"Zone $1")
    return df.withColumn(
        "id_zone",
        recode_values(normalized, {k: str(v) for k, v in ZONE_MAPPING.items()}, default=F.lit("1"))
        .cast("int"),
    )


def clean_forecast_tables(
    tables: list[DataFrame], clientes_map: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Proyeccion/Forecast tables → forecast facts
    (wor2.py:264-272,300-360). Returns (facts, unmapped_names).

    clientes_map: (nombre_cliente, id_cliente) dimension; names matched
    upper-trimmed (X2, wor2.py:327-329).
    """
    cleaned = []
    for df in tables:
        df = df.na.fill(0)                                        # N5
        df = df.drop("Py %")                                      # P1
        df = drop_leading_rows(df, "_row_idx", 1)                 # F5 (repeated header row)
        value_cols = [c for c in df.columns if c.startswith("WEEK") or c == "TOTAL"]
        # F3 — the reference scans EVERY source column for 'Total'
        # (wor2.py:269 row.astype(str).str.contains('Total').any()),
        # not just ZONA/CLIENTE (r9 review fix); the engine-added
        # lift metadata stays out of the scan
        src_cols = [
            c for c in df.columns
            if c not in ("zone", "nombre_mes", "mes", "anio", "_row_idx")
        ]
        df = rows_where_no_column_contains(df, "Total", src_cols)
        # F2 (wor2.py:270-271): drop rows whose first column is 0 — a
        # string compare like pandas' mixed-dtype !=0 (names pass, the
        # literal 0 / fillna(0) rows drop)
        first = F.coalesce(F.trim(F.col(df.columns[0]).cast("string")), F.lit("0"))
        df = df.filter(first != "0")
        for c in value_cols:
            df = df.withColumn(c, to_number_default(c))           # N1+N2
        cleaned.append(df)
    unioned = union_all_by_name(cleaned)                          # U1
    unioned = rename_map(unioned, {**WEEK_RENAME, "ZONA/CLIENTE": "nombre_cliente"})  # P2
    # WEEK-column schema drift across tables: union null-pads the
    # missing weeks; the reference fills them to 0.0 AFTER concat
    # (wor2.py:338-339 pd.to_numeric().fillna(0)) — a per-table-only
    # default left them NULL (r9 review fix)
    unioned = unioned.na.fill(
        0.0, subset=[c for c in WEEK_RENAME.values() if c in unioned.columns]
    )
    unioned = _with_zone_id(unioned)

    dim = clientes_map.select(
        norm_upper("nombre_cliente").alias("__name_key"), "id_cliente"
    )
    probe = unioned.withColumn("__name_key", norm_upper("nombre_cliente"))
    enriched = probe.join(F.broadcast(dim), "__name_key", "left")  # J2
    unmapped = (
        enriched.filter(F.col("id_cliente").isNull()).select("nombre_cliente").distinct()
    )
    facts = (
        drop_null_rows(enriched, ["id_cliente"])                   # F1
        .withColumn("id_cliente", F.col("id_cliente").cast("int"))
        .select(
            "id_cliente", "id_zone",
            *WEEK_RENAME.values(),
            "mes", "anio", "nombre_mes",
        )                                                          # P4
    )
    return facts, unmapped


def harvest_zone_quotas(tables: list[DataFrame]) -> DataFrame:
    """Zone-level quotas: the first data row of each forecast table is
    the zone total; keep TOTAL > 0, id_cliente = 0 (wor2.py:171-178,216)."""
    rows = []
    for df in tables:
        zone_row = df.filter(F.col("_row_idx") == 0)
        rows.append(zone_row)
    unioned = union_all_by_name(rows)
    unioned = _with_zone_id(unioned)
    return (
        unioned.withColumn("cuota", to_number_default("TOTAL"))
        .filter(F.col("cuota") > 0)                               # F2
        .withColumn("id_cliente", F.lit(0))                       # P5
        .select("id_zone", "id_cliente", "cuota", "nombre_mes", "mes", "anio")
    )


def clean_category_tables(
    tables: list[DataFrame], producto_map: dict[str, int] | None = None
) -> tuple[DataFrame, DataFrame]:
    """Avancedeventa_Category tables → per-product quotas
    (wor2.py:256-292,362-408). Positional rename of columns 3,4 →
    cuota_dinero/cuota_volumen; product-name recode; drop unmapped.
    Returns (facts, unmapped_names).

    ``producto_map`` defaults to the reference's ``PRODUCTO_MAPPING``
    (wor2.py:36-48). DOCUMENTED DIVERGENCE: the reference's
    ``Series.map(PRODUCTO_MAPPING)`` (wor2.py:377-378) is exact-match;
    this engine matches upper-trimmed on both sides — a deliberate
    robustness superset (case/whitespace drift in workbook product
    names still maps; exact reference inputs are unaffected because
    upper-trim is injective on the 11 canonical names)."""
    if producto_map is None:
        producto_map = PRODUCTO_MAPPING
    cleaned = []
    for df in tables:
        df = rename_positional(df, {3: "cuota_dinero", 4: "cuota_volumen"})  # P3
        df = rename_map(df, {"Negocio.": "nombre_producto"})
        # NO first-row drop and NO 'Total' scrub here (r9 review fix):
        # the reference's limpiar_dataframe(df, 'category') is
        # fillna(0) ONLY (wor2.py:264-271 — the drops are the
        # 'forecast' branch); header/Total rows fall out as unmapped
        # products at the map step, exactly as wor2.py:377-379 drops
        # them — but a REAL product in the first data row must load
        df = df.withColumns(
            {
                "cuota_dinero": to_number_default("cuota_dinero"),
                "cuota_volumen": to_number_default("cuota_volumen", dtype="double"),
            }
        )
        cleaned.append(select_present(df, [
            "nombre_producto", "cuota_dinero", "cuota_volumen",
            "zone", "nombre_mes", "mes", "anio", "_row_idx",
        ]))
    unioned = union_all_by_name(cleaned)                          # U1
    unioned = _with_zone_id(unioned)
    recoded = unioned.withColumn(
        "id_producto",
        recode_values(
            norm_upper("nombre_producto"),
            {k.upper(): str(v) for k, v in producto_map.items()},
            default=F.lit(None).cast("string"),
        ).cast("int"),
    )                                                              # J3
    unmapped = recoded.filter(F.col("id_producto").isNull()).select("nombre_producto").distinct()
    facts = (
        drop_null_rows(recoded, ["id_producto"])
        .withColumn("cuota_volumen", F.col("cuota_volumen").cast("int"))
        .select("id_producto", "id_zone", "cuota_dinero", "cuota_volumen",
                "nombre_mes", "mes", "anio")
    )
    return facts, unmapped


def clean_cuota_forecast(
    df: DataFrame, clientes_map: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The DORMANT fourth WOR pipeline (wor2.py:410-460;
    ``ingest_cuota_forecast_data`` is defined but commented out of the
    run at wor2.py:469 — SURVEY §3 note). Implemented for parity,
    deliberately not wired to a sink by default, mirroring the
    reference.

    Per-client quota facts: upper-trim name map → id_cliente (J2/X2),
    zone recode with default 1 (J3), drop unmapped (F1), TOTAL → cuota
    lenient-numeric with 0 default (N1+N2), final projection
    (id_zone, id_cliente, cuota, nombre_mes, mes, anio). Dedup keys for
    the eventual sink are (id_cliente, id_zone, mes, anio)
    (wor2.py:441-446) — pass them to ``append_incremental`` when
    wiring. Returns (facts, unmapped_names)."""
    if "TOTAL" not in df.columns:  # wor2.py:412 guard
        empty = df.sparkSession.createDataFrame(
            [], "id_zone int, id_cliente int, cuota double, nombre_mes string, mes int, anio int"
        )
        return empty, df.sparkSession.createDataFrame([], "nombre_cliente string")

    df = _with_zone_id(df)
    dim = clientes_map.select(
        norm_upper("nombre_cliente").alias("__name_key"), "id_cliente"
    )
    probe = df.withColumn("__name_key", norm_upper("nombre_cliente"))
    enriched = probe.join(F.broadcast(dim), "__name_key", "left")   # J2
    unmapped = (
        enriched.filter(F.col("id_cliente").isNull()).select("nombre_cliente").distinct()
    )
    facts = (
        drop_null_rows(enriched, ["id_cliente"])                    # F1
        .withColumns(
            {
                "id_cliente": F.col("id_cliente").cast("int"),
                "cuota": to_number_default("TOTAL"),                # N1+N2
            }
        )
        .select("id_zone", "id_cliente", "cuota", "nombre_mes", "mes", "anio")  # P4
    )
    return facts, unmapped


#: wor2.py:441-446 — dedup keys for the dormant pipeline's sink.
CUOTA_FORECAST_DEDUP_KEYS = ["id_cliente", "id_zone", "mes", "anio"]
