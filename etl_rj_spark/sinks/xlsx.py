"""Minimal .xlsx writer (stdlib zipfile — no openpyxl):
one named table per sheet, grid anchored at A1. Numbers are written as
numeric cells, strings as inline strings, None as omitted cells.

The archive is a conformant OPC package — ``[Content_Types].xml``,
root ``_rels/.rels``, workbook/sheet/table relationships, and
``<tableParts>`` binding each sheet to its named table — so the output
opens in Excel/openpyxl, not just this repo's own stdlib parser
(``sources/xlsx_native.py``). All cell values and table names are
XML-escaped; a value containing ``&``, ``<`` or ``>`` roundtrips
verbatim instead of corrupting the member XML.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape, quoteattr

#: Characters illegal in XML 1.0 even when escaped (C0 controls except
#: tab/newline/carriage-return) — a cell containing them would produce
#: member XML every parser rejects.
_XML_ILLEGAL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _xml_clean(s: str) -> str:
    return _XML_ILLEGAL.sub("", s)


def _normalize_headers(header_row: list) -> list[str]:
    """Unique, non-empty header names — Excel requires each tableColumn
    name to be unique AND match its header cell text, or it flags the
    workbook for repair. None/empty → ColumnN; duplicates → suffixed."""
    out: list[str] = []
    seen: dict[str, int] = {}
    for i, h in enumerate(header_row):
        name = _xml_clean(str(h)).strip() if h is not None else ""
        if not name:
            name = f"Column{i + 1}"
        base = name
        while name.casefold() in seen:
            seen[base.casefold()] += 1
            name = f"{base}_{seen[base.casefold()]}"
        seen.setdefault(name.casefold(), 1)
        out.append(name)
    return out

NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
NS_PKG = "http://schemas.openxmlformats.org/package/2006/relationships"
NS_CT = "http://schemas.openxmlformats.org/package/2006/content-types"
CT_WORKBOOK = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
CT_SHEET = "application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"
CT_TABLE = "application/vnd.openxmlformats-officedocument.spreadsheetml.table+xml"
CT_RELS = "application/vnd.openxmlformats-package.relationships+xml"


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
        return f'<c r="{ref}" t="inlineStr"><is><t>{escape(_xml_clean(v))}</t></is></c>'
    # bool is an int subclass — test it FIRST; a numeric <v>True</v>
    # cell is invalid OPC content (Excel repairs the workbook)
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
        # NaN/±inf have no xlsx numeric representation: inline string
        return f'<c r="{ref}" t="inlineStr"><is><t>{v}</t></is></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v}</v></c>'
    # datetimes / Decimals / anything else: write the string form —
    # a repr inside a numeric <v> cell would corrupt the workbook
    return f'<c r="{ref}" t="inlineStr"><is><t>{escape(_xml_clean(str(v)))}</t></is></c>'


def write_xlsx(path: str, tables: list[tuple[str, list[list]]]) -> str:
    """tables = [(table_name, grid)] — each on its own sheet, grid[0]
    is the header row; the named-table ref spans the grid."""
    members: dict[str, str] = {}
    sheet_entries, rel_entries, ct_overrides = [], [], []
    for idx, (name, grid) in enumerate(tables, start=1):
        # normalized header names go into BOTH the header row cells and
        # the tableColumn entries — they must match exactly
        headers = _normalize_headers(grid[0])
        grid = [list(headers)] + [list(r) for r in grid[1:]]
        rows_xml = []
        for r, row in enumerate(grid):
            cells = "".join(
                _cell_xml(f"{_col_letter(c)}{r + 1}", v) for c, v in enumerate(row)
            )
            rows_xml.append(f'<row r="{r + 1}">{cells}</row>')
        ref = f"A1:{_col_letter(len(grid[0]) - 1)}{len(grid)}"
        members[f"xl/worksheets/sheet{idx}.xml"] = (
            f'<?xml version="1.0"?>'
            f'<worksheet xmlns="{NS_MAIN}" xmlns:r="{NS_REL}">'
            f'<dimension ref="{ref}"/>'
            f"<sheetData>{''.join(rows_xml)}</sheetData>"
            f'<tableParts count="1"><tablePart r:id="rIdT"/></tableParts>'
            "</worksheet>"
        )
        cols = "".join(
            f'<tableColumn id="{c + 1}" name={quoteattr(h)}/>'
            for c, h in enumerate(headers)
        )
        members[f"xl/tables/table{idx}.xml"] = (
            f'<?xml version="1.0"?><table xmlns="{NS_MAIN}" id="{idx}" '
            f"name={quoteattr(name)} displayName={quoteattr(name)} "
            f'ref="{ref}" headerRowCount="1">'
            f'<autoFilter ref="{ref}"/>'
            f'<tableColumns count="{len(grid[0])}">{cols}</tableColumns>'
            '<tableStyleInfo showRowStripes="1"/>'
            "</table>"
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
        ct_overrides.append(
            f'<Override PartName="/xl/worksheets/sheet{idx}.xml" ContentType="{CT_SHEET}"/>'
            f'<Override PartName="/xl/tables/table{idx}.xml" ContentType="{CT_TABLE}"/>'
        )
    members["xl/workbook.xml"] = (
        f'<?xml version="1.0"?><workbook xmlns="{NS_MAIN}" xmlns:r="{NS_REL}">'
        f"<sheets>{''.join(sheet_entries)}</sheets></workbook>"
    )
    members["xl/_rels/workbook.xml.rels"] = (
        f'<?xml version="1.0"?><Relationships xmlns="{NS_PKG}">'
        f"{''.join(rel_entries)}</Relationships>"
    )
    members["_rels/.rels"] = (
        f'<?xml version="1.0"?><Relationships xmlns="{NS_PKG}">'
        f'<Relationship Id="rId1" Type="{NS_REL}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    members["[Content_Types].xml"] = (
        f'<?xml version="1.0"?><Types xmlns="{NS_CT}">'
        f'<Default Extension="rels" ContentType="{CT_RELS}"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        f'<Override PartName="/xl/workbook.xml" ContentType="{CT_WORKBOOK}"/>'
        f"{''.join(ct_overrides)}</Types>"
    )
    with zipfile.ZipFile(path, "w") as z:
        for name, content in members.items():
            z.writestr(name, content)
    return path
