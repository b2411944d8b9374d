"""The dependency-free XLSX reader against a hand-built workbook —
S3/S4 un-gated: named-table discovery, range slicing, shared/inline
strings, numerics, and the full classify→Spark lift, all without
openpyxl.
"""

from __future__ import annotations

import zipfile

import pytest

NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
NS_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


@pytest.fixture()
def workbook(tmp_path):
    """Minimal real .xlsx: one sheet, two named tables (one matching
    the WOR pattern, one distractor), shared + inline strings, ints,
    floats, and an empty cell inside a table range."""
    p = tmp_path / "wor.xlsx"
    shared = ["ZONA/CLIENTE", "WEEK 1", "TOTAL", "ACME Corp.", "Total", "x"]

    def cell(ref, v=None, t=None, inline=None):
        if inline is not None:
            return f'<c r="{ref}" t="inlineStr"><is><t>{inline}</t></is></c>'
        ta = f' t="{t}"' if t else ""
        return f'<c r="{ref}"{ta}><v>{v}</v></c>'

    sheet = f"""<?xml version="1.0"?>
<worksheet xmlns="{NS_MAIN}"><sheetData>
<row r="1">{cell("A1", 0, "s")}{cell("B1", 1, "s")}{cell("C1", 2, "s")}{cell("E1", 5, "s")}</row>
<row r="2">{cell("A2", 3, "s")}{cell("B2", 5)}{cell("C2", 10.5)}{cell("E2", 7)}</row>
<row r="3">{cell("A3", 4, "s")}{cell("B3", 1)}{cell("C3", 1)}</row>
<row r="4">{cell("A4", inline="Beta  Industries")}{cell("C4", 3)}</row>
</sheetData></worksheet>"""

    members = {
        "xl/workbook.xml": f'<?xml version="1.0"?><workbook xmlns="{NS_MAIN}" '
        f'xmlns:r="{NS_REL}"><sheets><sheet name="WOR" sheetId="1" r:id="rId1"/></sheets></workbook>',
        "xl/_rels/workbook.xml.rels": f'<?xml version="1.0"?><Relationships xmlns="{NS_PKG}">'
        f'<Relationship Id="rId1" Type="{NS_REL}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>',
        "xl/worksheets/sheet1.xml": sheet,
        "xl/worksheets/_rels/sheet1.xml.rels": f'<?xml version="1.0"?><Relationships xmlns="{NS_PKG}">'
        f'<Relationship Id="rId1" Type="{NS_REL}/table" Target="../tables/table1.xml"/>'
        f'<Relationship Id="rId2" Type="{NS_REL}/table" Target="../tables/table2.xml"/></Relationships>',
        "xl/tables/table1.xml": f'<?xml version="1.0"?><table xmlns="{NS_MAIN}" id="1" '
        f'name="Forecast_Zone 1_Enero" displayName="Forecast_Zone 1_Enero" ref="A1:C4"/>',
        "xl/tables/table2.xml": f'<?xml version="1.0"?><table xmlns="{NS_MAIN}" id="2" '
        f'name="RandomTable" displayName="RandomTable" ref="E1:E2"/>',
        "xl/sharedStrings.xml": f'<?xml version="1.0"?><sst xmlns="{NS_MAIN}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>",
    }
    with zipfile.ZipFile(p, "w") as z:
        for name, content in members.items():
            z.writestr(name, content)
    return str(p)


def test_named_table_discovery_and_values(workbook):
    from etl_rj_spark.sources.xlsx_native import read_xlsx_tables

    tables = read_xlsx_tables(workbook)
    assert set(tables) == {"Forecast_Zone 1_Enero", "RandomTable"}
    t = tables["Forecast_Zone 1_Enero"]
    assert list(t.columns) == ["ZONA/CLIENTE", "WEEK 1", "TOTAL"]
    assert t.shape == (3, 3)
    assert t.iloc[0].tolist() == ["ACME Corp.", 5, 10.5]     # shared str, int, float
    assert t.iloc[1].tolist() == ["Total", 1, 1]
    assert t.iloc[2, 0] == "Beta  Industries"                # inline string
    import pandas as pd

    assert pd.isna(t.iloc[2, 1])                             # gap inside the range


def test_classify_and_lift_to_spark(spark, workbook):
    """e2e: the gated read_workbook_tables now falls back to the
    native parser; WOR classification and the Spark lift run on it."""
    from etl_rj_spark.sources.excel_tables import (
        classify_tables,
        read_workbook_tables,
        tables_to_spark,
    )

    named = classify_tables(read_workbook_tables(workbook))
    assert len(named) == 1                                   # distractor skipped
    t = named[0]
    assert (t.kind, t.zone, t.mes, t.month_name_en) == ("Forecast", "Zone1", 1, "January")

    ((_, df),) = tables_to_spark(spark, [t.__class__(**{**t.__dict__})], anio=2024)
    rows = df.orderBy("_row_idx").collect()
    assert [r["zone"] for r in rows] == ["Zone1"] * 3
    assert rows[0]["nombre_mes"] == "January" and rows[0]["anio"] == 2024


def test_whole_sheet_scan(workbook):
    from etl_rj_spark.sources.xlsx_native import read_xlsx_sheet

    pdf = read_xlsx_sheet(workbook)
    assert list(pdf.columns)[:3] == ["ZONA/CLIENTE", "WEEK 1", "TOTAL"]
    assert pdf.shape[0] == 3


def test_write_xlsx_normalizes_headers_and_strips_illegal_chars(tmp_path):
    """Duplicate / None headers are uniquified (same text in header
    cells and tableColumn names — Excel repairs the file otherwise);
    XML-1.0-illegal control chars are stripped from string cells."""
    from etl_rj_spark.sinks.xlsx import write_xlsx
    from etl_rj_spark.sources.xlsx_native import read_xlsx_tables

    path = str(tmp_path / "t.xlsx")
    write_xlsx(
        path,
        [("T1", [["a", "a", None, "a"], ["x\x00y", 1, 2, "ok\x07"]])],
    )
    [(name, pdf)] = read_xlsx_tables(path).items()
    assert list(pdf.columns) == ["a", "a_2", "Column3", "a_3"]
    assert pdf.iloc[0].tolist() == ["xy", 1, 2, "ok"]
