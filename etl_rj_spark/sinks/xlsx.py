"""Minimal .xlsx writer (stdlib zipfile — no openpyxl):
one named table per sheet, grid anchored at A1. Numbers are written as
numeric cells, strings as inline strings, None as omitted cells."""

from __future__ import annotations

import zipfile

NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
NS_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_letter(i: int) -> str:
    s = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        s = chr(65 + r) + s
    return s


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, str):
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'
    return f'<c r="{ref}"><v>{v}</v></c>'


def write_xlsx(path: str, tables: list[tuple[str, list[list]]]) -> str:
    """tables = [(table_name, grid)] — each on its own sheet, grid[0]
    is the header row; the named-table ref spans the grid."""
    members: dict[str, str] = {}
    sheet_entries, rel_entries = [], []
    for idx, (name, grid) in enumerate(tables, start=1):
        rows_xml = []
        for r, row in enumerate(grid):
            cells = "".join(
                _cell_xml(f"{_col_letter(c)}{r + 1}", v) for c, v in enumerate(row)
            )
            rows_xml.append(f'<row r="{r + 1}">{cells}</row>')
        members[f"xl/worksheets/sheet{idx}.xml"] = (
            f'<?xml version="1.0"?><worksheet xmlns="{NS_MAIN}">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
        )
        ref = f"A1:{_col_letter(len(grid[0]) - 1)}{len(grid)}"
        members[f"xl/tables/table{idx}.xml"] = (
            f'<?xml version="1.0"?><table xmlns="{NS_MAIN}" id="{idx}" '
            f'name="{name}" displayName="{name}" ref="{ref}"/>'
        )
        members[f"xl/worksheets/_rels/sheet{idx}.xml.rels"] = (
            f'<?xml version="1.0"?><Relationships xmlns="{NS_PKG}">'
            f'<Relationship Id="rIdT" Type="{NS_REL}/table" Target="../tables/table{idx}.xml"/>'
            "</Relationships>"
        )
        sheet_entries.append(f'<sheet name="T{idx}" sheetId="{idx}" r:id="rId{idx}"/>')
        rel_entries.append(
            f'<Relationship Id="rId{idx}" Type="{NS_REL}/worksheet" '
            f'Target="worksheets/sheet{idx}.xml"/>'
        )
    members["xl/workbook.xml"] = (
        f'<?xml version="1.0"?><workbook xmlns="{NS_MAIN}" xmlns:r="{NS_REL}">'
        f"<sheets>{''.join(sheet_entries)}</sheets></workbook>"
    )
    members["xl/_rels/workbook.xml.rels"] = (
        f'<?xml version="1.0"?><Relationships xmlns="{NS_PKG}">'
        f"{''.join(rel_entries)}</Relationships>"
    )
    with zipfile.ZipFile(path, "w") as z:
        for name, content in members.items():
            z.writestr(name, content)
    return path
