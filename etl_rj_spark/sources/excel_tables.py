"""S4 — Excel named-table extraction by regex (wor2.py:95-160).

The reference opens a workbook with openpyxl, iterates each sheet's
*named table objects*, matches table names against
``(Avancedeventa_Category|Proyeccion_Vendedor|Forecast)_(zone)_(month)``
patterns, and slices each table range into a DataFrame whose first row
is the header, attaching (kind, zone, month) metadata from the name.

Split into two layers so the classification/metadata logic is testable
without openpyxl (absent in this container):

- ``classify_tables``: pure logic over {table_name: pandas.DataFrame}.
- ``read_workbook_tables``: openpyxl discovery (import-gated) feeding
  ``classify_tables``; each extracted table becomes a Spark DataFrame
  via the Arrow path with metadata attached as literal columns.

Workbooks are small desktop artifacts — driver-side discovery is the
right distribution story (the *data* goes distributed immediately
after ``spark.createDataFrame``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rj_spark.functions.dates import MONTH_ES_EN

#: wor2.py:104-108 — table-name patterns: kind_zone_month.
TABLE_NAME_RE = re.compile(
    r"^(?P<kind>Avancedeventa_Category|Proyeccion_Vendedor|Forecast)"
    r"_(?P<zone>Zone\s*[1-6]|KamEast|KamCentral)"
    r"_(?P<month>[A-Za-z]+)$"
)

#: Spanish month → month number (via the explicit ES→EN table).
_MONTH_NUM = {es: i + 1 for i, es in enumerate(MONTH_ES_EN)}


@dataclass
class NamedTable:
    kind: str           # Avancedeventa_Category | Proyeccion_Vendedor | Forecast
    zone: str           # Zone1..Zone6 | KamEast | KamCentral
    month_name_es: str  # Enero..Diciembre
    month_name_en: str
    mes: int
    data: pd.DataFrame


def classify_tables(tables: dict[str, pd.DataFrame]) -> list[NamedTable]:
    """Match table names against the reference patterns; non-matching
    tables are distractors and skipped (wor2.py:119-144)."""
    out: list[NamedTable] = []
    for name, pdf in tables.items():
        m = TABLE_NAME_RE.match(name.strip())
        if not m:
            continue
        month_es = m.group("month").capitalize()
        if month_es not in MONTH_ES_EN:
            continue
        out.append(
            NamedTable(
                kind=m.group("kind"),
                zone=m.group("zone").replace(" ", ""),
                month_name_es=month_es,
                month_name_en=MONTH_ES_EN[month_es],
                mes=_MONTH_NUM[month_es],
                data=pdf,
            )
        )
    return out


def tables_to_spark(
    spark: SparkSession, tables: list[NamedTable], anio: int
) -> list[tuple[NamedTable, DataFrame]]:
    """Lift each extracted table into a Spark DataFrame with the
    name-derived metadata attached as literal columns
    (wor2.py:147-149, 274-283)."""
    out = []
    for t in tables:
        pdf = t.data.reset_index(drop=True)
        pdf["_row_idx"] = pdf.index  # source-row order for F5/order-dependent ops
        df = (
            _pdf_to_spark(spark, pdf)
            .withColumn("zone", F.lit(t.zone))
            .withColumn("nombre_mes", F.lit(t.month_name_en))
            .withColumn("mes", F.lit(t.mes))
            .withColumn("anio", F.lit(anio))
        )
        out.append((t, df))
    return out


#: pandas dtype → Spark type for the empty-frame lift below. Object
#: (string) is the fallback — an empty sheet carries no type evidence,
#: the same contract CSV inference has on an empty file.
_PD_TO_SPARK = {
    "int64": "bigint",
    "int32": "int",
    "float64": "double",
    "float32": "float",
    "bool": "boolean",
    "datetime64[ns]": "timestamp",
}


def _pdf_to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """``spark.createDataFrame`` with a defined EMPTY-frame contract:
    a 0-row pandas frame raises CANNOT_INFER_EMPTY_SCHEMA under plain
    inference, but an empty sheet/table is a legitimate source state —
    lift it with types taken from the pandas dtypes (object → string),
    so downstream casts behave exactly as on the CSV path (r10
    degenerate-input sweep fix)."""
    if len(pdf) > 0:
        return spark.createDataFrame(pdf)
    ddl = ", ".join(
        f"`{c}` {_PD_TO_SPARK.get(str(dt), 'string')}"
        for c, dt in zip(pdf.columns, pdf.dtypes)
    )
    return spark.createDataFrame([], ddl)


#: OLE2 compound-file magic — the container of legacy BIFF .xls files.
_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


def _is_legacy_xls(path: str) -> bool:
    """Magic-byte sniff: an OLE2 container is a real legacy BIFF .xls.
    (Files merely *named* .xls that are actually zip/XLSX return False
    — a common export-tool mislabel — and flow to the XLSX parsers.)"""
    try:
        with open(path, "rb") as f:
            return f.read(8) == _OLE2_MAGIC
    except OSError:
        return False  # let the real reader produce its own error


def read_excel_sheet(spark: SparkSession, path: str, sheet: int | str = 0) -> DataFrame:
    """S3 — whole-sheet Excel scan (``pd.read_excel``,
    ventas_totales.py:87): driver-side read lifted through the Arrow
    path. True legacy BIFF .xls goes through the native BIFF8 reader
    (sources/xls_biff.py — the reference accepts .xls via pd.read_excel,
    ventas_totales.py:80-90); a corrupt OLE2 container gets a clear
    error from it rather than an opaque zip failure."""
    if _is_legacy_xls(path):
        from etl_rj_spark.sources.xls_biff import XlsFormatError, read_xls_sheet

        try:
            pdf = read_xls_sheet(path, sheet)
        except XlsFormatError as ex:
            raise ValueError(
                f"{path}: unreadable legacy BIFF .xls ({ex}) — "
                "re-export as .xlsx (or .csv) and retry"
            ) from ex
        return _pdf_to_spark(spark, pdf)
    try:
        pdf = pd.read_excel(path, sheet_name=sheet)
    except ImportError:
        # stdlib fallback: zipfile+ElementTree parser (values only —
        # what data_only=True reads anyway)
        from etl_rj_spark.sources.xlsx_native import read_xlsx_sheet

        pdf = read_xlsx_sheet(path, sheet)
    return _pdf_to_spark(spark, pdf)


def read_workbook_tables(path: str) -> dict[str, pd.DataFrame]:
    """Discover named tables in a workbook (wor2.py:95,119-144:
    ``load_workbook(data_only=True)``; first row of each table range is
    the header). Requires openpyxl."""
    if _is_legacy_xls(path):
        # BIFF8 has no Table (ListObject) parts — the S4 named-table
        # workflow is an .xlsx-only concept; sheets of a legacy .xls
        # still load via read_excel_sheet
        raise ValueError(
            f"{path}: named-table discovery needs .xlsx (legacy BIFF .xls "
            "has no table objects) — re-export as .xlsx and retry"
        )
    try:
        from openpyxl import load_workbook
    except ImportError:
        # stdlib fallback (sources/xlsx_native.py): same contract —
        # {table_name: frame with first range row as header}
        from etl_rj_spark.sources.xlsx_native import read_xlsx_tables

        return read_xlsx_tables(path)

    wb = load_workbook(path, data_only=True)  # pragma: no cover
    tables: dict[str, pd.DataFrame] = {}
    for sheet in wb.worksheets:  # pragma: no cover
        for name, ref in sheet.tables.items():
            cells = sheet[ref.ref if hasattr(ref, "ref") else ref]
            rows = [[c.value for c in row] for row in cells]
            if not rows:
                continue
            tables[name] = pd.DataFrame(rows[1:], columns=rows[0])
    return tables  # pragma: no cover
