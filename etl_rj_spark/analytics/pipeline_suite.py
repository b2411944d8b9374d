"""Driver-oracled END-TO-END runs of the four reference pipelines
(SURVEY §3; VERDICT r12 #3) — fixture file → clean → enrich → dedup →
sink → read-back, each replayed in DuckDB over the same shared tables
the fixture derives from, the way ``curation_pipeline_e2e`` already
pins the LLM-curation composition.

The four §3 entry points (ventas_totales.py, cartera.py,
pending_orders.py, wor2.py) were pytest-verified end-to-end since
round 2 but never driver-oracled as COMPOSED queries: each operator in
them is individually green, and these queries pin their composition —
filter order, column flow, dedup-key normalization, snapshot stamping
— against one SQL replay of the whole chain.

Fixture posture (same as coverage_suite): inputs derive from the
25-row ``nation`` dimension (keyed rows only — a report line with no
key is junk the reference's loaders discard), so every value in the
output is a deterministic function of the shared tables plus static
literals, and the DuckDB oracle replays file → sink → read-back
without seeing the file. The reference invariants ride IN-QUERY as
asserts: incremental re-run inserts 0 (Ventas PDF §9 / wor2.py:236),
the snapshot sink appends full days without dedup (K2,
cartera.py:185-196).
"""

from __future__ import annotations

import csv
import datetime
import os

from pyspark.sql import functions as F

from etl_rj_spark.analytics.coverage_suite import _scratch
from etl_rj_spark.analytics.suite import _q, _t

#: DuckDB fragment — X3 clean_customer_name replay (cartera.py:92-98;
#: identical chain to the clean_name_kernel oracle).
def _sql_clean(expr: str) -> str:
    return (
        "trim(regexp_replace(regexp_replace(lower(trim(CAST(" + expr +
        r" AS VARCHAR))), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))"
    )


def _keyed_nation_rows(spark, sf_dir):
    """Collected (key, name) nation rows, keyed only, sorted — 25-row
    dimension: fixture construction, not a data path."""
    return sorted(
        _t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .where(F.col("n_nationkey").isNotNull())
        .collect(),
        key=lambda r: (r[0], r[1] if r[1] is not None else ""),
    )


# ---------------------------------------------------------------------------
# 1. ventas — incremental sales-fact load (ventas_totales.py)
# ---------------------------------------------------------------------------

@_q(
    "ventas_pipeline_e2e",
    """
    WITH nk AS (
      SELECT CAST(n_nationkey AS INT) AS k, n_name AS name
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    dim AS (
      SELECT lower(trim(n_name)) AS key, CAST(n_nationkey AS INT) AS id_cliente
      FROM nation
    ),
    export AS (
      -- the CSV fixture rows, value-for-value (the CSV round-trip is
      -- lossless: Spark writes and re-reads its own quoting); the
      -- 'Nobody Inc' row is unmapped by construction and must drop
      SELECT k, name,
             make_date(2024, k % 12 + 1, k % 28 + 1) AS fecha,
             'INV-' || CAST(k AS VARCHAR) AS document_number,
             'SKU' || CAST(k AS VARCHAR) AS item,
             CAST(k AS DOUBLE) AS cantidad_producto,
             CASE WHEN k % 5 = 0 THEN NULL
                  ELSE CAST(k * 10 + 0.5 AS DOUBLE) END AS amount
      FROM nk
    ),
    enriched AS (
      SELECT d.id_cliente, e.fecha, e.document_number, e.item,
             e.cantidad_producto, e.amount
      FROM export e LEFT JOIN dim d ON lower(trim(e.name)) = d.key
    )
    SELECT id_cliente, fecha, document_number, item, cantidad_producto,
           'Invoice' AS tipo, 'desc' AS descripcion, 'Cls' AS clase,
           'EA' AS presentacion, amount, CAST(NULL AS VARCHAR) AS created_from
    FROM enriched
    WHERE id_cliente IS NOT NULL AND fecha IS NOT NULL
    """,
    tags=("pipeline-e2e", "S1", "P1", "P2", "X1", "J2", "A1", "F1", "N1", "D1", "J4", "K1"),
)
def ventas_pipeline_e2e(spark, sf_dir):
    """END-TO-END ventas pipeline (SURVEY §3 entry 1,
    ventas_totales.py:84-262) as the reference runs it: sales-export
    CSV (S1) → drop Status / rename / money+date parse → name-
    normalized dim lookup with unmapped reporting → key normalization
    → anti-join incremental append → re-run the SAME file (must insert
    0, Ventas PDF §9) → read the warehouse back. The export derives
    from nation (each nation one sale row; every 5th amount is junk →
    NULL after N1) plus one unmapped 'Nobody Inc' row, so the oracle
    replays clean→enrich→dedup→sink content from the shared table."""
    from etl_rj_spark.pipelines.ventas import load_ventas

    d = _scratch("e2e_ventas")
    csv_dir = os.path.join(d, "export")
    wh = os.path.join(d, "wh")

    n = _t(spark, sf_dir, "nation").where(F.col("n_nationkey").isNotNull())
    k = F.col("n_nationkey").cast("int")
    export = n.select(
        F.col("n_name").alias("Company Name"),
        F.concat_ws(
            "/",
            (k % 12 + 1).cast("string"),
            (k % 28 + 1).cast("string"),
            F.lit("2024"),
        ).alias("Date"),
        F.concat(F.lit("INV-"), k.cast("string")).alias("Document Number"),
        F.lit("Invoice").alias("Type"),
        F.concat(F.lit("SKU"), k.cast("string")).alias("Item"),
        F.lit("desc").alias("Description"),
        F.lit("Cls").alias("Class"),
        k.cast("string").alias("Quantity"),
        F.lit("EA").alias("UOM"),
        F.when(k % 5 == 0, F.lit("junk"))
        .otherwise(F.concat((k * 10).cast("string"), F.lit(".5")))
        .alias("Amount"),
        F.lit(None).cast("string").alias("Created From"),
        F.lit("ok").alias("Status"),
    ).unionByName(
        spark.createDataFrame(
            [("Nobody Inc", "1/1/2024", "INV-X", "Invoice", "SKU-X", "desc",
              "Cls", "1", "EA", "10.5", None, "ok")],
            "`Company Name` string, `Date` string, `Document Number` string, "
            "`Type` string, `Item` string, `Description` string, `Class` string, "
            "`Quantity` string, `UOM` string, `Amount` string, "
            "`Created From` string, `Status` string",
        )
    )
    export.write.mode("overwrite").option("header", True).csv(csv_dir)
    src = spark.read.option("header", True).csv(csv_dir)  # S1

    clientes = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("id_cliente"),
        F.col("n_name").alias("nombre_cliente"),
    )
    inserted, unmapped = load_ventas(spark, src, clientes, wh)
    rerun_inserted, _ = load_ventas(spark, src, clientes, wh)
    assert rerun_inserted == 0  # idempotent re-run (Ventas PDF §9)
    names = {r.nombre_cliente for r in unmapped.collect()}
    assert "Nobody Inc" in names  # A1 unmapped report carries the planted row

    return spark.read.parquet(wh).select(
        "id_cliente", "fecha", "document_number", "item", "cantidad_producto",
        "tipo", "descripcion", "clase", "presentacion", "amount", "created_from",
    )


# ---------------------------------------------------------------------------
# 2. cartera — accounts-receivable daily snapshot (cartera.py)
# ---------------------------------------------------------------------------

#: Deterministic accounting-money cents for nation key k.
_CENTS = "(100000 + k * 137)"


@_q(
    "cartera_pipeline_e2e",
    f"""
    WITH nk AS (
      SELECT CAST(n_nationkey AS INT) AS k, n_name AS name,
             CAST(n_regionkey AS INT) AS region
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    dim AS (
      SELECT {_sql_clean('nombre_cliente')} AS key, id_cliente, id_zone FROM (
        SELECT n_name AS nombre_cliente, CAST(n_nationkey AS INT) AS id_cliente,
               CAST(n_regionkey AS VARCHAR) AS id_zone
        FROM nation
        UNION ALL SELECT 'Walmart Ecommerce', 9001, '77'
        UNION ALL SELECT 'Amazon', 9002, '78'
      )
    ),
    export AS (
      -- one AR line per nation (name dirtied with trailing ' .' the X3
      -- clean strips) + the two e-commerce rewrite rows + the
      -- placeholder row (recoded to 'Sin Nombre', unmapped, dropped)
      SELECT name || ' .' AS nombre_cliente, 'Zone ' || CAST(k % 5 AS VARCHAR) AS zona,
             'Invoice' AS tipo_transaccion,
             CASE WHEN k % 7 = 0 THEN NULL
                  ELSE make_date(2024, k % 12 + 1, k % 28 + 1) END AS fecha_facturacion,
             'D-' || CAST(k AS VARCHAR) AS document_number,
             CASE WHEN k % 5 = 0 THEN NULL
                  ELSE make_date(2024, k % 11 + 1, k % 25 + 1) END AS fecha_pago,
             CASE WHEN k % 11 = 0 THEN 0.0
                  WHEN k % 3 = 0 THEN -({_CENTS} / 100.0)
                  ELSE {_CENTS} / 100.0 END AS open_balance
      FROM nk WHERE name IS NOT NULL
      UNION ALL SELECT 'Walmart Ecommerce', 'E-Commerce', 'Invoice',
             DATE '2024-01-06', 'D-WAL', DATE '2024-02-06', 2000.0
      UNION ALL SELECT 'Amazon', 'E-Commerce', 'Invoice',
             DATE '2024-01-06', 'D-AMZ', DATE '2024-02-06', -3000.0
    ),
    enriched AS (
      SELECT d.id_cliente,
             COALESCE(d.id_zone, trim(e.zona)) AS id_zone,
             e.tipo_transaccion, e.fecha_facturacion, e.document_number,
             e.fecha_pago, e.open_balance
      FROM export e LEFT JOIN dim d ON {_sql_clean('e.nombre_cliente')} = d.key
    )
    SELECT id_cliente, id_zone, tipo_transaccion, fecha_facturacion,
           document_number, fecha_pago, open_balance,
           DATE '2024-01-11' AS fecha_carga
    FROM enriched WHERE id_cliente IS NOT NULL
    """,
    tags=("pipeline-e2e", "S2", "F4", "X3", "X4", "X5", "N2", "N6", "D2", "D5", "J1", "K2", "A4"),
)
def cartera_pipeline_e2e(spark, sf_dir):
    """END-TO-END cartera pipeline (SURVEY §3 entry 2a,
    cartera.py:68-196): junk-trimmed CSV (S2: 6 junk lines + footer,
    trailing-space headers) → e-commerce reclassification (F4+X6,
    cartera.py:101-108) → placeholder recode (X5) → cleaned-name dim
    join (X3+J1) → accounting money parse (X4+N2) → lenient dates
    (D2+D5) → TWO stamped snapshot appends (K2) → latest-snapshot
    read-back (A4, partition-pruned). The full table must hold exactly
    2× one day's rows (full append, no dedup — the K2 contract), and
    only day 2 returns. Export rows derive from nation, names dirtied
    with punctuation the X3 clean strips; every 3rd balance is
    accounting-negative '( )', every 11th is junk → 0.0 default."""
    from etl_rj_spark.pipelines.cartera import clean_cartera
    from etl_rj_spark.sinks.snapshot import append_snapshot, read_latest_snapshot
    from etl_rj_spark.sources.trimmed_csv import read_csv_trimmed

    d = _scratch("e2e_cartera")
    os.makedirs(d)
    wh = os.path.join(d, "wh")
    path = os.path.join(d, "cartera.csv")

    rows = _keyed_nation_rows(spark, sf_dir)
    with open(path, "w", newline="") as fh:
        for i in range(6):
            fh.write(f"report junk line {i}\n")
        w = csv.writer(fh)
        w.writerow([
            "Zones for Financial Reporting ", "Customer:Project ",
            "Transaction Type ", "Date ", "Document Number ", "Due Date ",
            "Open Balance ", "P.O. No. ", "Age ",
        ])
        for k, name in rows:
            if name is None:
                continue  # the oracle's `name IS NOT NULL` arm
            cents = 100000 + k * 137
            whole, frac = cents // 100, cents % 100
            money = f"${whole:,}.{frac:02d}"
            if k % 11 == 0:
                money = "junk"  # X4 junk → 0.0 default (N2)
            elif k % 3 == 0:
                money = f"(${whole:,}.{frac:02d})"  # accounting negative
            fact = "not a date" if k % 7 == 0 else f"2024-{k % 12 + 1:02d}-{k % 28 + 1:02d}"
            pago = "bad" if k % 5 == 0 else f"2024-{k % 11 + 1:02d}-{k % 25 + 1:02d}"
            w.writerow([
                f"Zone {k % 5}", f"{name} .", "Invoice", fact, f"D-{k}",
                pago, money, "po", "30",
            ])
        w.writerow(["Walmart", "Ecommerce", "Invoice", "2024-01-06", "D-WAL",
                    "2024-02-06", "$2,000.00", "po", "15"])
        w.writerow(["Amazon", "Ecommerce", "Invoice", "2024-01-06", "D-AMZ",
                    "2024-02-06", "($3,000.00)", "po", "15"])
        w.writerow(["Zone B", "- no customer/project -", "Invoice",
                    "2024-01-07", "D-PLH", "2024-03-01", "50", "po", "9"])
        fh.write("GRAND TOTAL,,,,,,99999,,\n")

    src = read_csv_trimmed(spark, path, skiprows=6, skipfooter=1)  # S2
    clientes = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("id_cliente"),
        F.col("n_name").alias("nombre_cliente"),
        F.col("n_regionkey").cast("int").alias("id_zone"),
    ).unionByName(
        spark.createDataFrame(
            [(9001, "Walmart Ecommerce", 77), (9002, "Amazon", 78)],
            "id_cliente int, nombre_cliente string, id_zone int",
        )
    )
    snap, _unmapped = clean_cartera(src, clientes)
    append_snapshot(snap, wh, snapshot_date=datetime.date(2024, 1, 10))
    append_snapshot(snap, wh, snapshot_date=datetime.date(2024, 1, 11))
    # K2 contract: full snapshot each day, NO dedup across days (the
    # static e-commerce rows make snap non-empty on every regime, but
    # the guard keeps the all-empty read path on the documented
    # sidecar fallback, as pending_orders_pipeline_e2e needs)
    n = snap.count()
    if n:
        assert spark.read.parquet(wh).count() == 2 * n
    return read_latest_snapshot(spark, wh)


# ---------------------------------------------------------------------------
# 3. pending orders — daily snapshot with flexible status (pending_orders.py)
# ---------------------------------------------------------------------------

_QCENTS = "(150000 + k * 211)"


@_q(
    "pending_orders_pipeline_e2e",
    f"""
    WITH nk AS (
      SELECT CAST(n_nationkey AS INT) AS k, n_name AS name,
             CAST(n_regionkey AS INT) AS region
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    dim AS (
      SELECT {_sql_clean('n_name')} AS key, CAST(n_nationkey AS INT) AS id_cliente,
             CAST(n_regionkey AS INT) AS id_zone
      FROM nation
    ),
    export AS (
      SELECT k, name,
             CASE WHEN k % 9 = 0 THEN 0.0 ELSE {_QCENTS} / 100.0 END AS amount_net,
             substr('DOC-' || lpad(CAST(k AS VARCHAR), 25, '0'), 1, 20) AS document_number,
             COALESCE(CASE WHEN k % 7 = 0 THEN NULL
                           ELSE make_date(2024, k % 12 + 1, k % 28 + 1) END,
                      DATE '1900-01-01') AS fecha,
             CASE WHEN k % 4 = 0 THEN 'Descuento'
                  ELSE 'Class-' || CAST(k % 3 AS VARCHAR) END AS class_item,
             CAST(10000 + k AS INT) AS cantidad,
             substr('VALIDATED-' || repeat('X', 60), 1, 50) AS estado
      FROM nk
    ),
    enriched AS (
      SELECT d.id_cliente, e.class_item, e.cantidad, e.amount_net,
             e.document_number, e.estado, e.fecha,
             COALESCE(d.id_zone, 1) AS id_zone,
             monthname(e.fecha) AS nombre_mes, month(e.fecha) AS mes,
             day(e.fecha) AS dia, year(e.fecha) AS anio
      FROM export e LEFT JOIN dim d ON {_sql_clean('e.name')} = d.key
    )
    SELECT id_cliente, class_item, cantidad, amount_net, document_number,
           estado, fecha, id_zone, nombre_mes, mes, dia, anio,
           DATE '2024-03-02' AS fecha_carga
    FROM enriched WHERE id_cliente IS NOT NULL
    """,
    tags=("pipeline-e2e", "S2", "P4", "X3", "X7", "N2", "N4", "N6", "D2", "D4", "D6", "J1", "K2", "A4"),
)
def pending_orders_pipeline_e2e(spark, sf_dir):
    """END-TO-END pending-orders pipeline (SURVEY §3 entry 2b,
    pending_orders.py:59-174): junk-trimmed CSV with the flexible
    'Validated Status ' column (P4) → temporal dims with 1900-01-01
    default (D2+D4+D6) → cleaned-name dim join → thousands-separator
    quantity (N4) / plain money with 0 default / X7 truncation of
    document_number (20) and estado (50) → default zone 1 (N6) → two
    stamped snapshot appends → latest-snapshot read-back. Every 7th
    date is junk → defaults to 1900-01-01; every 9th amount is junk →
    0.0; every 4th class is empty → 'Descuento'."""
    from etl_rj_spark.pipelines.pending_orders import clean_pending_orders
    from etl_rj_spark.sinks.snapshot import append_snapshot, read_latest_snapshot
    from etl_rj_spark.sources.trimmed_csv import read_csv_trimmed

    d = _scratch("e2e_pending")
    os.makedirs(d)
    wh = os.path.join(d, "wh")
    path = os.path.join(d, "pending.csv")

    rows = _keyed_nation_rows(spark, sf_dir)
    estado_raw = "VALIDATED-" + "X" * 60  # → 50-char truncation
    with open(path, "w", newline="") as fh:
        for i in range(6):
            fh.write(f"junk {i}\n")
        w = csv.writer(fh)
        w.writerow([
            "Customer ", "Amount (Net) ", "Document Number ", "Date ",
            "Class Item ", "Quantity ", "Validated Status ",
        ])
        for k, name in rows:
            cents = 150000 + k * 211
            money = "junk" if k % 9 == 0 else f"${cents // 100:,}.{cents % 100:02d}"
            doc = "DOC-" + str(k).zfill(25)  # 29 chars → X7 truncates to 20
            fecha = "bad date" if k % 7 == 0 else f"2024-{k % 12 + 1:02d}-{k % 28 + 1:02d}"
            clase = "" if k % 4 == 0 else f"Class-{k % 3}"
            qty = f"{10000 + k:,}"  # thousands separator (N4)
            w.writerow([
                "" if name is None else name, money, doc, fecha, clase, qty,
                estado_raw,
            ])
        fh.write("total row,,,,,,\n")

    src = read_csv_trimmed(spark, path)  # S2 defaults: skiprows=6, skipfooter=1
    clientes = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("id_cliente"),
        F.col("n_name").alias("nombre_cliente"),
        F.col("n_regionkey").cast("int").alias("id_zone"),
    )
    snap, _unmapped = clean_pending_orders(src, clientes)
    append_snapshot(snap, wh, snapshot_date=datetime.date(2024, 3, 1))
    append_snapshot(snap, wh, snapshot_date=datetime.date(2024, 3, 2))
    # K2 contract — full snapshot each day, no dedup. Guarded on a
    # non-empty day: an all-empty snapshot table has ZERO partition
    # directories (only the _schema sidecar), so the bare read would
    # UNABLE_TO_INFER_SCHEMA — read_latest_snapshot's sidecar fallback
    # is the documented read path for that state (empty-regime parity)
    n = snap.count()
    if n:
        assert spark.read.parquet(wh).count() == 2 * n
    return read_latest_snapshot(spark, wh)


# ---------------------------------------------------------------------------
# 4. wor — workbook multi-table load (wor2.py)
# ---------------------------------------------------------------------------

@_q(
    "wor_pipeline_e2e",
    """
    WITH nk AS (
      SELECT CAST(n_nationkey AS INT) AS k, n_name AS name
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    cm AS (
      SELECT upper(trim(n_name)) AS key, CAST(n_nationkey AS INT) AS id_cliente
      FROM nation WHERE n_nationkey IS NOT NULL
    ),
    tabs(id_zone, mes, nombre_mes) AS (
      VALUES (1, 1, 'January'), (9, 2, 'February')
    ),
    forecast AS (
      -- per table: zone-total row dropped (F5), 'Total Q' scrubbed
      -- (F3), '0' row dropped (F2), 'Nobody Inc' unmapped (F1);
      -- nation rows with NULL names drop at F2 (coalesce → '0')
      SELECT 'forecast' AS tabla, c.id_cliente AS id1, t.id_zone,
             CAST(n.k + 1 AS DOUBLE) AS v1,
             CASE WHEN n.k % 2 = 0 THEN 0.0 ELSE CAST(n.k + 3 AS DOUBLE) END AS v2,
             t.nombre_mes, t.mes, 2024 AS anio
      FROM nk n CROSS JOIN tabs t
      JOIN cm c ON upper(trim(n.name)) = c.key
      WHERE n.name IS NOT NULL AND trim(n.name) <> '0'
        AND n.name NOT LIKE '%Total%'
    ),
    quotas AS (
      SELECT 'quota' AS tabla, 0 AS id1, id_zone, 50.0 AS v1,
             CAST(NULL AS DOUBLE) AS v2, nombre_mes, mes, 2024 AS anio
      FROM tabs
    ),
    categories(tabla, id1, id_zone, v1, v2, nombre_mes, mes, anio) AS (
      VALUES ('category', 5, 2, 111.5, 40.0, 'January', 1, 2024),
             ('category', 11, 2, 20.25, 7.0, 'January', 1, 2024)
    )
    SELECT * FROM forecast
    UNION ALL SELECT * FROM quotas
    UNION ALL SELECT * FROM categories
    ORDER BY tabla, id1, id_zone
    """,
    tags=("pipeline-e2e", "S4", "P1", "P3", "F2", "F3", "F5", "J2", "J3", "N5", "U1", "X2", "K1"),
)
def wor_pipeline_e2e(spark, sf_dir):
    """END-TO-END WOR workbook pipeline (SURVEY §3 entry 3,
    wor2.py:95-408): a real .xlsx with regex-discovered named tables
    (two forecast tables Zone1/Enero + KamEast/Febrero, one category
    table, one distractor that must NOT classify) → per-kind cleaning
    (F5 zone-row drop, F3 'Total' scrub, F2 zero-name drop, N5
    fillna) → zone recode (J3) / upper-trim client map (X2+J2) /
    positional rename + product recode for categories (P3+J3) → UNION
    ALL per group (U1) → anti-join incremental append of the forecast
    facts (K1, wor2.py:341) → re-run inserts 0 → read-back. Output is
    the three fact groups normalized to one (tabla, id1, id_zone, v1,
    v2, month) grain: forecast rows carry (semana_1, semana_3) — the
    latter exercising the N5 fill on the planted NULL WEEK 3 cells —
    quotas carry the harvested zone totals, categories the recoded
    product quotas."""
    from etl_rj_spark.pipelines.wor import (
        FORECAST_KEYS,
        clean_category_tables,
        clean_forecast_tables,
        harvest_zone_quotas,
    )
    from etl_rj_spark.sinks.incremental import append_incremental
    from etl_rj_spark.sinks.xlsx import write_xlsx
    from etl_rj_spark.sources.excel_tables import (
        classify_tables,
        read_workbook_tables,
        tables_to_spark,
    )

    d = _scratch("e2e_wor")
    os.makedirs(d)
    wh = os.path.join(d, "wh")
    path = os.path.join(d, "wor.xlsx")

    rows = _keyed_nation_rows(spark, sf_dir)

    def forecast_grid():
        grid = [["ZONA/CLIENTE", "WEEK 1", "WEEK 2", "WEEK 3", "WEEK 4",
                 "WEEK 5", "TOTAL", "Py %"]]
        grid.append(["Zone totals", 10, 10, 10, 10, 10, 50, 1])  # quota row
        for k, name in rows:
            week3 = None if k % 2 == 0 else k + 3  # N5/null-fill case
            grid.append([name, k + 1, k + 2, week3, k + 4, k + 5, 5 * k + 15, 1])
        grid.append(["Total Q", 99, 99, 99, 99, 99, 99, 1])       # F3 scrub
        grid.append(["0", 0, 0, 0, 0, 0, 0, 1])                   # F2 drop
        grid.append(["Nobody Inc", 1, 1, 1, 1, 1, 5, 1])          # F1 unmapped
        return grid

    category_grid = [
        ["Negocio.", "b", "c", "col3", "col4"],
        ["header", 0, 0, None, None],
        ["Jelly Fruits", 1, 1, 111.5, 40.0],
        ["  cotton candy ", 2, 2, 20.25, 7.0],   # upper-trim robustness
        ["Total", 3, 3, 999.0, 999.0],
        ["Mystery", 4, 4, 5.0, 6.0],
    ]
    write_xlsx(path, [
        ("Forecast_Zone1_Enero", forecast_grid()),
        ("Proyeccion_Vendedor_KamEast_Febrero", forecast_grid()),
        ("Avancedeventa_Category_Zone2_Enero", category_grid),
        ("Quarterly_Totals", [["x", "y"], [1, 2]]),  # distractor
    ])

    classified = classify_tables(read_workbook_tables(path))
    assert len(classified) == 3  # the distractor must NOT classify
    lifted = tables_to_spark(spark, classified, anio=2024)
    forecast_dfs = [df for t, df in lifted if t.kind in ("Forecast", "Proyeccion_Vendedor")]
    cat_dfs = [df for t, df in lifted if t.kind == "Avancedeventa_Category"]

    clientes_map = _t(spark, sf_dir, "nation").where(
        F.col("n_nationkey").isNotNull()
    ).select(
        F.col("n_name").alias("nombre_cliente"),
        F.col("n_nationkey").cast("int").alias("id_cliente"),
    )
    facts, _unmapped = clean_forecast_tables(forecast_dfs, clientes_map)
    append_incremental(spark, facts, wh, FORECAST_KEYS)
    rerun = append_incremental(spark, facts, wh, FORECAST_KEYS)
    assert rerun == 0  # wor2.py:341 anti-join dedup re-run invariant
    fread = spark.read.parquet(wh)

    quotas = harvest_zone_quotas(forecast_dfs)
    cats, _cat_unmapped = clean_category_tables(cat_dfs)

    null_d = F.lit(None).cast("double")
    out = (
        fread.select(
            F.lit("forecast").alias("tabla"),
            F.col("id_cliente").alias("id1"),
            "id_zone",
            F.col("semana_1").alias("v1"),
            F.col("semana_3").alias("v2"),
            "nombre_mes", "mes",
            F.col("anio").cast("int").alias("anio"),
        )
        .unionByName(
            quotas.select(
                F.lit("quota").alias("tabla"),
                F.col("id_cliente").cast("int").alias("id1"),
                "id_zone",
                F.col("cuota").alias("v1"),
                null_d.alias("v2"),
                "nombre_mes", "mes",
                F.col("anio").cast("int").alias("anio"),
            )
        )
        .unionByName(
            cats.select(
                F.lit("category").alias("tabla"),
                F.col("id_producto").alias("id1"),
                "id_zone",
                F.col("cuota_dinero").alias("v1"),
                F.col("cuota_volumen").cast("double").alias("v2"),
                "nombre_mes", "mes",
                F.col("anio").cast("int").alias("anio"),
            )
        )
        .orderBy("tabla", "id1", "id_zone")
    )
    return out
