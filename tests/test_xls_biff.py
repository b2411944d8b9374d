"""Native BIFF8 .xls reader vs the test-fixture writer: round-trips
through both CFB layouts (mini-stream under the 4096-byte cutoff,
regular FAT above it), every cell record kind, SST CONTINUE splits,
multi-sheet ordering, and the pipeline dispatch."""

from __future__ import annotations

import pytest

from etl_rj_spark.sources.xls_biff import (
    XlsFormatError,
    read_xls_sheet,
    read_xls_sheets,
)
from tests.xls_util import write_xls

GRID = [
    ["cliente", "monto", "unidades", "activo"],
    ["Bodega Güemes", 1234.5, 10, True],
    ["Súper Chino", -0.25, -3, False],
    ["ACME", 7.0, 536870000, True],  # near the RK 30-bit edge
]


def test_ministream_roundtrip_all_cell_kinds(tmp_path):
    p = str(tmp_path / "small.xls")
    write_xls(p, {"Ventas": GRID})
    pdf = read_xls_sheet(p)
    assert list(pdf.columns) == GRID[0]
    assert pdf.iloc[0].tolist() == GRID[1]
    assert pdf.iloc[1].tolist() == GRID[2]
    assert pdf.iloc[2].tolist() == GRID[3]


def test_regular_fat_layout_roundtrip(tmp_path):
    """> 4096-byte Workbook stream: data lives in normal sectors, no
    mini-stream involved."""
    big = [["k", "v"]] + [[i, i * 1.5] for i in range(400)]
    p = str(tmp_path / "big.xls")
    write_xls(p, {"Hoja1": big}, force_large=True)
    pdf = read_xls_sheet(p)
    assert len(pdf) == 400
    assert pdf.iloc[399].tolist() == [399, 598.5]


def test_sst_continue_split_mid_string(tmp_path):
    """A shared string whose characters straddle an SST→CONTINUE
    boundary (flag byte restated) must reassemble exactly — for both
    compressed and UTF-16 strings."""
    grid = [["name"], ["Almacén Ñandú"], ["plainascii"]]
    p = str(tmp_path / "split.xls")
    # string 0 is the header "name"; 1 is the accented one
    write_xls(p, {"S": grid}, split_sst_mid_string=1)
    pdf = read_xls_sheet(p)
    assert pdf.iloc[0, 0] == "Almacén Ñandú"
    assert pdf.iloc[1, 0] == "plainascii"


def test_multi_sheet_order_and_selection(tmp_path):
    p = str(tmp_path / "multi.xls")
    write_xls(
        p,
        {
            "Primero": [["a"], [1]],
            "Segundo": [["b"], [2]],
        },
    )
    sheets = read_xls_sheets(p)
    assert list(sheets) == ["Primero", "Segundo"]
    assert read_xls_sheet(p, 0).columns.tolist() == ["a"]
    assert read_xls_sheet(p, 1).columns.tolist() == ["b"]
    with pytest.raises(XlsFormatError, match="2 sheets"):
        read_xls_sheet(p, 2)


def test_corrupt_ole2_raises_format_error(tmp_path):
    p = tmp_path / "corrupt.xls"
    p.write_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    with pytest.raises(XlsFormatError):
        read_xls_sheet(str(p))


def test_dispatch_loads_real_xls_into_spark(spark, tmp_path):
    """read_sales_export: a true BIFF .xls now LOADS through the native
    reader (reference parity, ventas_totales.py:80-90); a corrupt OLE2
    container still gets the actionable re-export error."""
    from etl_rj_spark.pipelines.ventas import read_sales_export

    p = str(tmp_path / "export.xls")
    write_xls(p, {"Ventas": GRID})
    df = read_sales_export(spark, p)
    assert df.columns == GRID[0]
    got = sorted(r.cliente for r in df.collect())
    assert got == sorted([r[0] for r in GRID[1:]])

    bad = tmp_path / "bad.xls"
    bad.write_bytes(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 64)
    with pytest.raises(ValueError, match="re-export"):
        read_sales_export(spark, str(bad))


def test_sheet_selection_by_name(tmp_path):
    p = str(tmp_path / "named.xls")
    write_xls(p, {"Primero": [["a"], [1]], "Ventas": [["b"], [2]]})
    assert read_xls_sheet(p, "Ventas").columns.tolist() == ["b"]
    with pytest.raises(XlsFormatError, match="no sheet named 'Nope'"):
        read_xls_sheet(p, "Nope")


def test_hidden_sheets_keep_index_parity(tmp_path):
    """A hidden first sheet still occupies index 0 — pd.read_excel/xlrd
    count hidden sheets, so dropping them would return the wrong sheet
    for every integer index after it."""
    p = str(tmp_path / "hidden.xls")
    write_xls(
        p,
        {"Oculta": [["h"], [0]], "Visible": [["v"], [9]]},
        hidden={"Oculta"},
    )
    sheets = read_xls_sheets(p)
    assert list(sheets) == ["Oculta", "Visible"]
    assert read_xls_sheet(p, 0).columns.tolist() == ["h"]
    assert read_xls_sheet(p, 1).columns.tolist() == ["v"]


def test_formula_cached_string_with_continue(tmp_path):
    """A FORMULA whose cached STRING result spills into a CONTINUE
    record must reassemble (and a plain one must still work) — before
    round 5 the CONTINUE case threw and lost the whole workbook."""
    from etl_rj_spark.sinks.xls_legacy import FormulaString

    long_text = "Almacén Ñandú y algo más largo todavía"
    grid = [["name"], [FormulaString(long_text)], [FormulaString("corto")], ["plain"]]
    p = str(tmp_path / "formula.xls")
    write_xls(p, {"S": grid}, split_string_result=True)
    pdf = read_xls_sheet(p)
    assert pdf.iloc[0, 0] == long_text
    assert pdf.iloc[1, 0] == "corto"
    assert pdf.iloc[2, 0] == "plain"

    p2 = str(tmp_path / "formula_nosplit.xls")
    write_xls(p2, {"S": grid})
    assert read_xls_sheet(p2).iloc[0, 0] == long_text


def test_excel_dispatch_sheet_name_on_xls(spark, tmp_path):
    """read_excel_sheet(path, 'name') on a legacy .xls must honor the
    name (it used to silently coerce to index 0)."""
    from etl_rj_spark.sources.excel_tables import read_excel_sheet

    p = str(tmp_path / "byname.xls")
    write_xls(p, {"Primero": [["a"], [1]], "Ventas": [["b"], [2]]})
    assert read_excel_sheet(spark, p, "Ventas").columns == ["b"]
    with pytest.raises(ValueError, match="Ventas2"):
        read_excel_sheet(spark, p, "Ventas2")
