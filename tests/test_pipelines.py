"""End-to-end pipeline tests over FIXTURES.md-shaped dirty inputs:
the documented reference invariants (SURVEY §5.2) — idempotent
incremental re-runs, full-snapshot stamping, unmapped-name drop+report,
money/date coercion — through the real sources and sinks."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_rj_spark.pipelines.cartera import clean_cartera
from etl_rj_spark.pipelines.pending_orders import clean_pending_orders
from etl_rj_spark.pipelines.ventas import VENTAS_DEDUP_KEYS, clean_ventas, load_ventas
from etl_rj_spark.pipelines.wor import (
    clean_category_tables,
    clean_forecast_tables,
    harvest_zone_quotas,
)
from etl_rj_spark.sinks.snapshot import append_snapshot, read_latest_snapshot
from etl_rj_spark.sources.excel_tables import classify_tables, tables_to_spark
from etl_rj_spark.sources.trimmed_csv import read_csv_trimmed


@pytest.fixture(scope="module")
def clientes(spark):
    return spark.createDataFrame(
        [
            (1, "ACME Corp.", 10),
            (2, "Beta  Industries", 20),
            (3, "Gamma-LLC", None),   # null zone → default-zone path
            (4, "Walmart Ecommerce", 30),
            (5, "Amazon", 40),
        ],
        "id_cliente int, nombre_cliente string, id_zone int",
    )


# ---------------------------------------------------------------------------
# ventas (incremental)
# ---------------------------------------------------------------------------

@pytest.fixture()
def ventas_csv(tmp_path):
    p = tmp_path / "ventas.csv"
    p.write_text(
        "Company Name,Date,Document Number,Type,Item,Description,Class,Quantity,UOM,Amount,Created From,Status\n"
        "acme corp.,01/15/2024,INV-1 ,Invoice,SKU1,desc,Cls,2,EA,100.5,,ok\n"
        "ACME CORP.,01/16/2024,INV-2,Invoice,SKU2,desc,Cls,1,EA,junk,,ok\n"
        "Nobody Inc,01/17/2024,INV-3,Invoice,SKU3,desc,Cls,3,EA,30,,ok\n"
        "Beta  industries,02/01/2024,INV-4,Invoice,SKU4,desc,Cls,1,EA,7.25,,ok\n"
    )
    return str(p)


def test_ventas_incremental(spark, clientes, ventas_csv, tmp_path):
    src = spark.read.option("header", True).csv(ventas_csv)  # S1
    wh = str(tmp_path / "ventas_wh")

    inserted, unmapped = load_ventas(spark, src, clientes, wh)
    assert inserted == 3  # Nobody Inc dropped as unmapped
    assert [r.nombre_cliente for r in unmapped.collect()] == ["Nobody Inc"]

    # idempotence: re-running the same file inserts 0 (Ventas PDF §9)
    inserted2, _ = load_ventas(spark, src, clientes, wh)
    assert inserted2 == 0

    wh_df = spark.read.parquet(wh)
    assert wh_df.count() == 3
    row = wh_df.filter(F.col("document_number") == "INV-2").first()
    assert row.amount is None  # junk → null (N1)
    assert row.fecha == datetime.date(2024, 1, 16)
    # key normalization: trailing space trimmed on document_number
    assert wh_df.filter(F.col("document_number") == "INV-1").count() == 1


def test_ventas_partial_overlap(spark, clientes, ventas_csv, tmp_path):
    src = spark.read.option("header", True).csv(ventas_csv)
    wh = str(tmp_path / "wh2")
    facts, _ = clean_ventas(src, clientes)
    # preload only the INV-1 row
    facts.filter(F.col("document_number") == "INV-1").write.parquet(wh)
    inserted, _ = load_ventas(spark, src, clientes, wh)
    assert inserted == 2  # only the genuinely new rows


# ---------------------------------------------------------------------------
# cartera (snapshot) via the trimmed-CSV source
# ---------------------------------------------------------------------------

CARTERA_HEADER = (
    "Zones for Financial Reporting ,Customer:Project ,Transaction Type ,Date ,"
    "Document Number ,Due Date ,Open Balance ,P.O. No. ,Age "
)


@pytest.fixture()
def cartera_csv(tmp_path):
    junk = "\n".join(f"report junk line {i}" for i in range(6))
    rows = "\n".join(
        [
            'Zone A,ACME corp,Invoice,2024-01-05,D-1,2024-02-05,"$1,234.56",po,30',
            'Walmart,Ecommerce,Invoice,2024-01-06,D-2,not a date,"($2,000.00)",po,15',
            "Amazon,Ecommerce,Invoice,2024-01-06,D-5,2024-02-06,10,po,15",
            "Zone B,- no customer/project -,Invoice,2024-01-07,D-3,2024-03-01,junk,po,9",
            "Zone C,Unknown Person,Invoice,2024-01-08,D-4,2024-02-20,50,po,1",
        ]
    )
    p = tmp_path / "cartera.csv"
    p.write_text(f"{junk}\n{CARTERA_HEADER}\n{rows}\nGRAND TOTAL,,,,,,99999,,\n")
    return str(p)


def test_cartera_snapshot(spark, clientes, cartera_csv, tmp_path):
    src = read_csv_trimmed(spark, cartera_csv, skiprows=6, skipfooter=1)  # S2
    assert "_row_idx" in src.columns
    assert src.count() == 5  # junk header/footer trimmed

    snap, unmapped = clean_cartera(src, clientes)
    rows = {r.document_number: r for r in snap.collect()}
    # ACME matched through punctuation/case cleaning (X3)
    assert rows["D-1"].id_cliente == 1
    assert rows["D-1"].open_balance == 1234.56   # $ and , stripped
    assert rows["D-1"].id_zone == "10"           # DB zone wins (N6)
    # e-commerce rewrite: Walmart+Ecommerce → 'Walmart Ecommerce'
    # (cartera.py:104-105 literal) maps to client 4
    assert rows["D-2"].id_cliente == 4
    assert rows["D-2"].open_balance == -2000.0   # accounting negative
    assert rows["D-2"].fecha_pago is None        # invalid date → null (D2)
    # Amazon+Ecommerce → 'Amazon' (cartera.py:107-108) maps to client 5
    assert rows["D-5"].id_cliente == 5 and rows["D-5"].id_zone == "40"
    # unmapped: 'Sin Nombre' (recoded placeholder) and 'Unknown Person' dropped
    assert sorted(r.nombre_cliente for r in unmapped.collect()) == ["Sin Nombre", "Unknown Person"]

    # two snapshot days → latest-snapshot returns only day 2
    wh = str(tmp_path / "cartera_wh")
    append_snapshot(snap, wh, snapshot_date=datetime.date(2024, 1, 10))
    append_snapshot(snap, wh, snapshot_date=datetime.date(2024, 1, 11))
    all_rows = spark.read.parquet(wh)
    assert all_rows.count() == 6  # full snapshot each day, no dedup (K2)
    latest = read_latest_snapshot(spark, wh)
    assert latest.count() == 3
    assert {r.fecha_carga for r in latest.collect()} == {datetime.date(2024, 1, 11)}


# ---------------------------------------------------------------------------
# pending orders (snapshot, flexible status column)
# ---------------------------------------------------------------------------

def _pending_csv(tmp_path, status_header):
    junk = "\n".join(f"junk {i}" for i in range(6))
    hdr = (
        f"Customer ,Amount (Net) ,Document Number ,Date ,Class Item ,Quantity ,{status_header}"
    )
    rows = "\n".join(
        [
            'ACME corp,"$1,500.00",DOC-000000000000000000001,2024-03-05,Item,"1,234",Validated',
            "GAMMA-llc.,250,D2,bad date,,"  # null class_item → Descuento; bad date → 1900
            + "10," + ("S" * 60),
        ]
    )
    p = tmp_path / f"pending_{status_header.strip()}.csv"
    p.write_text(f"{junk}\n{hdr}\n{rows}\ntotal row,,,,,,\n")
    return str(p)


@pytest.mark.parametrize("status_header", ["Validated Status ", "Status "])
def test_pending_orders_flexible_status(spark, clientes, tmp_path, status_header):
    src = read_csv_trimmed(spark, _pending_csv(tmp_path, status_header))
    snap, unmapped = clean_pending_orders(src, clientes)
    rows = {r.id_cliente: r for r in snap.collect()}
    assert unmapped.count() == 0
    acme = rows[1]
    assert acme.amount_net == 1500.0
    assert acme.cantidad == 1234                      # thousands strip (N4)
    assert len(acme.document_number) == 20            # X7 truncation
    assert acme.mes == 3 and acme.nombre_mes == "March" and acme.anio == 2024
    gamma = rows[3]
    assert gamma.fecha == datetime.date(1900, 1, 1)   # D4 default
    assert gamma.class_item == "Descuento"            # N2 default
    assert gamma.id_zone == 1                         # null dim zone → default 1
    assert len(gamma.estado) == 50                    # X7 truncation


# ---------------------------------------------------------------------------
# WOR workbook tables
# ---------------------------------------------------------------------------

def _wor_tables():
    # row 0 is the zone-total row: harvested by the quota pipeline,
    # dropped (F5) by the forecast pipeline
    forecast = pd.DataFrame(
        {
            "ZONA/CLIENTE": ["Zone totals", "ACME CORP.", "Total Q", "0", "BETA  INDUSTRIES"],
            "WEEK 1": [10.0, 1.0, 99.0, 0.0, 2.0],
            "WEEK 2": [10.0, 1.0, 99.0, 0.0, 2.0],
            "WEEK 3": [10.0, 1.0, 99.0, 0.0, None],
            "WEEK 4": [10.0, 1.0, 99.0, 0.0, 2.0],
            "WEEK 5": [10.0, 1.0, 99.0, 0.0, 2.0],
            "TOTAL": [50.0, 5.0, 99.0, 0.0, 8.0],
            "Py %": [1.0, 1.0, 1.0, 1.0, 1.0],
        }
    )
    category = pd.DataFrame(
        {
            "Negocio.": ["header", "Producto Uno", "Total", "Producto Desconocido"],
            "b": [0, 1, 2, 3],
            "c": [0, 1, 2, 3],
            "col3": [None, 111.5, 999.0, 5.0],
            "col4": [None, 40.0, 999.0, 6.0],
        }
    )
    return {
        "Forecast_Zone1_Enero": forecast,
        "Proyeccion_Vendedor_KamEast_Febrero": forecast,
        "Avancedeventa_Category_Zone2_Enero": category,
        "NotATable_Zone9_Enero": category,  # distractor: no pattern match
    }


def test_wor_classification_and_pipelines(spark):
    classified = classify_tables(_wor_tables())
    assert sorted((t.kind, t.zone, t.mes) for t in classified) == [
        ("Avancedeventa_Category", "Zone2", 1),
        ("Forecast", "Zone1", 1),
        ("Proyeccion_Vendedor", "KamEast", 2),
    ]
    lifted = tables_to_spark(spark, classified, anio=2024)

    forecast_dfs = [df for t, df in lifted if t.kind in ("Forecast", "Proyeccion_Vendedor")]
    clientes_map = spark.createDataFrame(
        [("ACME Corp.", 1), ("Beta  Industries", 2)], "nombre_cliente string, id_cliente int"
    )
    facts, unmapped = clean_forecast_tables(forecast_dfs, clientes_map)
    got = facts.collect()
    # per table: zone row dropped (F5), 'Total' row dropped (F3),
    # zero-name row dropped (F2) → ACME + BETA rows per table
    assert len(got) == 4
    acme_z1 = [r for r in got if r.id_cliente == 1 and r.id_zone == 1][0]
    assert acme_z1.semana_1 == 1.0 and acme_z1.mes == 1 and acme_z1.anio == 2024
    beta = [r for r in got if r.id_cliente == 2][0]
    assert beta.semana_3 == 0.0  # N5 fillna(0)
    assert unmapped.count() == 0

    quotas = harvest_zone_quotas(forecast_dfs).collect()
    assert len(quotas) == 2
    assert all(q.id_cliente == 0 and q.cuota == 50.0 for q in quotas)
    assert {q.id_zone for q in quotas} == {1, 9}  # Zone1 → 1, KamEast → 9 (wor2.py:50-62)

    cat_dfs = [df for t, df in lifted if t.kind == "Avancedeventa_Category"]
    cats, cat_unmapped = clean_category_tables(cat_dfs, {"Producto Uno": 11})
    crows = cats.collect()
    assert len(crows) == 1
    assert crows[0].id_producto == 11 and crows[0].cuota_dinero == 111.5
    assert crows[0].cuota_volumen == 40 and crows[0].id_zone == 2
    # r9 parity fix: category tables get NO first-row drop / Total
    # scrub (reference limpiar_dataframe only drops for forecast), so
    # header/Total rows surface in the unmapped report instead of
    # silently vanishing — and a real product in row 0 would load
    assert {r.nombre_producto for r in cat_unmapped.collect()} == {
        "header", "Total", "Producto Desconocido"
    }


def test_category_default_product_map(spark):
    """With NO caller-supplied map, clean_category_tables uses the
    reference's PRODUCTO_MAPPING verbatim (wor2.py:36-48, shipped as
    the engine default per VERDICT r6 #4) — incl. the upper-trim
    robustness superset on the probe side."""
    import pandas as pd

    from etl_rj_spark.sources.excel_tables import classify_tables, tables_to_spark

    cat = pd.DataFrame(
        {
            "Negocio.": ["hdr", "Jelly Fruits", "  cotton candy ", "Total", "Mystery"],
            "b": [0, 1, 2, 3, 4],
            "c": [0, 1, 2, 3, 4],
            "col3": [None, 10.0, 20.0, 99.0, 5.0],
            "col4": [None, 1.0, 2.0, 99.0, 6.0],
        }
    )
    lifted = tables_to_spark(
        spark, classify_tables({"Avancedeventa_Category_Zone3_Enero": cat}), anio=2024
    )
    facts, unmapped = clean_category_tables([df for _, df in lifted])
    got = {r.id_producto: r for r in facts.collect()}
    assert set(got) == {5, 11}          # Jelly Fruits → 5, Cotton Candy → 11
    assert all(r.id_zone == 3 for r in got.values())
    assert {r.nombre_producto for r in unmapped.collect()} == {
        "hdr", "Total", "Mystery"
    }


def test_pending_orders_quarantine_channel(spark, clientes, tmp_path):
    """Quarantined variant: unmapped clients and unparseable raw cells
    land in the dead-letter side with their reasons; the valid side is
    strictly clean (no defaulted dates), and valid ∪ quarantine
    accounts for every input row."""
    from etl_rj_spark.pipelines.pending_orders import clean_pending_orders_quarantined

    junk = "\n".join(f"junk {i}" for i in range(6))
    hdr = "Customer ,Amount (Net) ,Document Number ,Date ,Class Item ,Quantity ,Status "
    rows = "\n".join(
        [
            'ACME corp,"$1,500.00",DOC1,2024-03-05,Item,"1,234",Validated',
            "Nobody Known,100,DOC2,2024-03-06,Item,5,Validated",  # unmapped client
            "GAMMA-llc.,250,DOC3,bad date,Item,junkqty,Validated",  # bad date + qty
        ]
    )
    p = tmp_path / "pending_quarantine.csv"
    p.write_text(f"{junk}\n{hdr}\n{rows}\ntotal row,,,,,,\n")

    src = read_csv_trimmed(spark, str(p))
    valid, quarantine = clean_pending_orders_quarantined(src, clientes)

    v = valid.collect()
    assert [r.id_cliente for r in v] == [1]           # only the clean ACME row
    q = {r.document_number: r.reasons for r in quarantine.collect()}
    assert q["DOC2"] == ["client_unmapped"]
    assert q["DOC3"] == ["fecha_invalid", "cantidad_invalid"]
    assert valid.count() + quarantine.count() == 3


def test_ventas_observed_metrics(spark, clientes, ventas_csv, tmp_path):
    """observe()-based progress counters: the reference's len(df) /
    non-numeric diagnostics ride the single write action — metrics
    must equal the independently-counted values, with no extra scan
    in the pipeline itself."""
    from etl_rj_spark.pipelines.ventas import load_ventas_observed

    src = spark.read.option("header", True).csv(ventas_csv)
    wh = str(tmp_path / "ventas_wh_obs")
    inserted, unmapped, metrics = load_ventas_observed(spark, src, clientes, wh)
    assert inserted == 3
    assert metrics["rows_in"] == src.count()
    assert metrics["rows_valid"] == 3
    assert metrics["amount_nonnumeric"] == 1          # the junk INV-2 cell
    facts, _ = clean_ventas(src, clientes)
    want_total = facts.agg(
        (F.sum(F.round(F.col("amount") * 100).cast("long")) / F.lit(100.0)).alias("t")
    ).first().t
    assert metrics["amount_total"] == want_total


def test_cuota_forecast_dormant_pipeline(spark, clientes):
    """The dormant wor2.py:410-460 pipeline: name-mapped quota facts
    with zone recode and unmapped drop; missing TOTAL column returns
    empty (the reference's guard)."""
    from etl_rj_spark.pipelines.wor import clean_cuota_forecast

    src = spark.createDataFrame(
        [
            ("ACME CORP.", "Zone 1", "1,000.5", "March", 3, 2024),
            ("Nobody Known", "Zone 2", "50", "March", 3, 2024),
            ("gamma-llc", "Weird Zone", "junk", "April", 4, 2024),
        ],
        "nombre_cliente string, zone string, TOTAL string, nombre_mes string, mes int, anio int",
    )
    facts, unmapped = clean_cuota_forecast(src, clientes)
    rows = {r.id_cliente: r for r in facts.collect()}
    assert set(rows) == {1, 3}                        # Nobody Known dropped
    assert [r.nombre_cliente for r in unmapped.collect()] == ["Nobody Known"]
    assert rows[3].id_zone == 1                       # unknown zone → default
    assert rows[3].cuota == 0.0                       # junk → 0 (N1+N2)
    # pd.to_numeric(errors='coerce') rejects thousands separators; the
    # kernel must match the reference, not "improve" it (SURVEY §4)
    assert rows[1].cuota == 0.0

    nototal = src.drop("TOTAL")
    f2, u2 = clean_cuota_forecast(nototal, clientes)
    assert f2.count() == 0 and u2.count() == 0


def test_wor_end_to_end_from_xlsx_file(spark, tmp_path):
    """The complete S4 path from an actual .xlsx FILE (stdlib parser —
    openpyxl absent): discover named tables, classify, lift, and run
    the forecast pipeline — same assertions as the pre-extracted-frame
    test, now covering the file layer too."""
    from etl_rj_spark.sources.excel_tables import read_workbook_tables
    from tests.xlsx_util import write_xlsx

    def forecast_grid():
        return [
            ["ZONA/CLIENTE", "WEEK 1", "WEEK 2", "WEEK 3", "WEEK 4", "WEEK 5", "TOTAL", "Py %"],
            ["Zone totals", 10.0, 10.0, 10.0, 10.0, 10.0, 50.0, 1.0],
            ["ACME CORP.", 1.0, 1.0, 1.0, 1.0, 1.0, 5.0, 1.0],
            ["Total Q", 99.0, 99.0, 99.0, 99.0, 99.0, 99.0, 1.0],
            ["0", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0],
            ["BETA  INDUSTRIES", 2.0, 2.0, None, 2.0, 2.0, 8.0, 1.0],
        ]

    path = write_xlsx(
        str(tmp_path / "wor.xlsx"),
        [
            ("Forecast_Zone1_Enero", forecast_grid()),
            ("Proyeccion_Vendedor_KamEast_Febrero", forecast_grid()),
            ("NotATable_Zone9_Enero", [["x", "y"], [1, 2]]),  # distractor
        ],
    )

    classified = classify_tables(read_workbook_tables(path))
    assert sorted((t.kind, t.zone, t.mes) for t in classified) == [
        ("Forecast", "Zone1", 1),
        ("Proyeccion_Vendedor", "KamEast", 2),
    ]
    lifted = tables_to_spark(spark, classified, anio=2024)
    forecast_dfs = [df for _, df in lifted]
    clientes_map = spark.createDataFrame(
        [("ACME Corp.", 1), ("Beta  Industries", 2)], "nombre_cliente string, id_cliente int"
    )
    facts, unmapped = clean_forecast_tables(forecast_dfs, clientes_map)
    got = facts.collect()
    assert len(got) == 4 and unmapped.count() == 0
    beta = [r for r in got if r.id_cliente == 2][0]
    assert beta.semana_3 == 0.0  # None cell in the FILE → N5 default

    quotas = harvest_zone_quotas(forecast_dfs).collect()
    assert {q.id_zone for q in quotas} == {1, 9} and all(q.cuota == 50.0 for q in quotas)


def test_ventas_from_excel_file(spark, clientes, tmp_path):
    """S3 end-to-end: the ventas load from an .xlsx export through the
    extension dispatch (ventas_totales.py:80-90) and the native sheet
    reader — same invariants as the CSV path."""
    from etl_rj_spark.pipelines.ventas import read_sales_export
    from tests.xlsx_util import write_xlsx

    grid = [
        ["Company Name", "Date", "Document Number", "Type", "Item", "Description",
         "Class", "Quantity", "UOM", "Amount", "Created From", "Status"],
        ["acme corp.", "01/15/2024", "INV-1 ", "Invoice", "SKU1", "d", "C", 2, "EA", 100.5, "", "ok"],
        ["Nobody Inc", "01/17/2024", "INV-3", "Invoice", "SKU3", "d", "C", 3, "EA", 30, "", "ok"],
        ["Beta  industries", "02/01/2024", "INV-4", "Invoice", "SKU4", "d", "C", 1, "EA", 7.25, "", "ok"],
    ]
    path = write_xlsx(str(tmp_path / "ventas.xlsx"), [("SalesExport", grid)])

    src = read_sales_export(spark, path)
    wh = str(tmp_path / "ventas_xlsx_wh")
    inserted, unmapped = load_ventas(spark, src, clientes, wh)
    assert inserted == 2
    assert [r.nombre_cliente for r in unmapped.collect()] == ["Nobody Inc"]
    got = spark.read.parquet(wh)
    assert got.filter(F.col("document_number") == "INV-1").first().amount == 100.5

    with pytest.raises(ValueError):
        read_sales_export(spark, str(tmp_path / "ventas.parquet"))


def test_ventas_from_legacy_xls_file(spark, clientes, tmp_path):
    """S3 end-to-end over legacy BIFF: the same ventas load from a true
    .xls (OLE2/BIFF8) export through the extension dispatch and the
    native BIFF reader — same invariants as the .xlsx and CSV paths
    (ventas_totales.py:80-90 accepts .xls via pd.read_excel)."""
    from etl_rj_spark.pipelines.ventas import read_sales_export
    from tests.xls_util import write_xls

    grid = [
        ["Company Name", "Date", "Document Number", "Type", "Item", "Description",
         "Class", "Quantity", "UOM", "Amount", "Created From", "Status"],
        ["acme corp.", "01/15/2024", "INV-1 ", "Invoice", "SKU1", "d", "C", 2, "EA", 100.5, "", "ok"],
        ["Nobody Inc", "01/17/2024", "INV-3", "Invoice", "SKU3", "d", "C", 3, "EA", 30, "", "ok"],
        ["Beta  industries", "02/01/2024", "INV-4", "Invoice", "SKU4", "d", "C", 1, "EA", 7.25, "", "ok"],
    ]
    path = str(tmp_path / "ventas.xls")
    write_xls(path, {"SalesExport": grid})

    src = read_sales_export(spark, path)
    wh = str(tmp_path / "ventas_xls_wh")
    inserted, unmapped = load_ventas(spark, src, clientes, wh)
    assert inserted == 2
    assert [r.nombre_cliente for r in unmapped.collect()] == ["Nobody Inc"]
    got = spark.read.parquet(wh)
    assert got.filter(F.col("document_number") == "INV-1").first().amount == 100.5


def test_expire_snapshots_keeps_newest(spark, sf_dir, tmp_path):
    import datetime

    from etl_rj_spark.sinks.snapshot import (
        append_snapshot,
        expire_snapshots,
        read_latest_snapshot,
    )
    from etl_rj_spark.sources.parquet import read_parquet_table

    path = str(tmp_path / "snaps")
    df = read_parquet_table(spark, f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    days = [datetime.date(2024, 1, d) for d in (1, 2, 3, 4)]
    for d in days:
        append_snapshot(df, path, snapshot_date=d)

    dropped = expire_snapshots(spark, path, keep=2)
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = sorted(
        r.fecha_carga for r in
        spark.read.parquet(path).select("fecha_carga").distinct().collect()
    )
    assert left == days[2:]
    # latest still readable, keep<1 refused, idempotent re-run drops nothing
    assert read_latest_snapshot(spark, path).count() == df.count()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expire_snapshots(spark, path, keep=0)
    assert expire_snapshots(spark, path, keep=2) == []


def test_expire_snapshots_typed_ordering(spark, tmp_path):
    """Integer snapshot values must order numerically: version=10 is
    NEWER than version=9 even though it sorts lexicographically first
    (regression: string sort would have expired the newest)."""
    from etl_rj_spark.sinks.snapshot import expire_snapshots

    path = str(tmp_path / "vsnaps")
    df = spark.range(3).toDF("v")
    for ver in (8, 9, 10):
        df.withColumn("version", F.lit(ver)).write.mode("append").partitionBy(
            "version"
        ).parquet(path)

    dropped = expire_snapshots(spark, path, keep=1, snapshot_col="version")
    assert dropped == ["8", "9"]
    left = [r.version for r in spark.read.parquet(path).select("version").distinct().collect()]
    assert left == [10]


def test_snapshot_sidecar_repaired_and_evolves(spark, tmp_path):
    """ADVICE r11: the `_schema` sidecar write-skip must be VALIDATED —
    a corrupt (half-written) sidecar is repaired on the next append,
    and an append with an evolved schema refreshes the sidecar so the
    empty-table fallback never serves a stale shape. Steady-state
    appends with an unchanged schema still skip the rewrite."""
    import datetime
    import os

    from etl_rj_spark.sinks.snapshot import append_snapshot, read_latest_snapshot
    from etl_rj_spark.sinks.snapshot import _sidecar_needs_write

    path = str(tmp_path / "snaps")
    df = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("s"))
    stamped = append_snapshot(df, path, snapshot_date=datetime.date(2024, 1, 1))
    sidecar = os.path.join(path, "_schema")
    # unchanged schema → skip (no needless rewrite job per append)
    assert not _sidecar_needs_write(stamped, sidecar)

    # corrupt the sidecar the way an interrupted overwrite does:
    # parquet files present but unreadable footers
    for name in os.listdir(sidecar):
        if name.endswith(".parquet"):
            with open(os.path.join(sidecar, name), "wb") as fh:
                fh.write(b"not a parquet footer")
    assert _sidecar_needs_write(stamped, sidecar)
    append_snapshot(df, path, snapshot_date=datetime.date(2024, 1, 2))
    assert [f.name for f in spark.read.parquet(sidecar).schema.fields] == [
        "k", "s", "fecha_carga",
    ]

    # schema evolution: the sidecar follows the NEWEST appended shape
    evolved = df.withColumn("extra", F.lit(1))
    append_snapshot(evolved, path, snapshot_date=datetime.date(2024, 1, 3))
    assert "extra" in spark.read.parquet(sidecar).columns
    # the table itself still reads and serves the latest snapshot
    # (a plain parquet read resolves ONE footer's schema; evolved
    # columns need mergeSchema on the read side — the sidecar's job
    # is only that the empty-table fallback carries the newest shape)
    assert read_latest_snapshot(spark, path).count() == 3
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert "extra" in merged.columns


def test_kmeans_assign_carry_collision_raises(spark):
    """ADVICE r11: a carry name shadowing the assignment's internal or
    output columns must be an explicit error, not silent duplicate
    columns."""
    import pytest as _pytest

    from etl_rj_spark.operators.kmeans import kmeans_assign

    pts = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cid int, centroid array<double>"
    )
    # "__cents" is _assign's packed-centroid broadcast column — it
    # collides INSIDE the assignment crossJoin, not in the output
    # projection, so it must be in the reserved set too (ADVICE r12)
    for bad in ("cell", "__iv", "vec_id", "__cents"):
        with _pytest.raises(ValueError, match="collide"):
            kmeans_assign(pts, cents, carry={bad: F.lit(1)})
