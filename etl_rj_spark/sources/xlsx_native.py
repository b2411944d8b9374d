"""Dependency-free XLSX reader (stdlib zipfile + ElementTree) — the
un-gated implementation of S3/S4 (SURVEY §2.1).

An .xlsx file is a zip of XML parts: ``xl/workbook.xml`` lists sheets
(relationship ids), ``xl/worksheets/sheetN.xml`` holds the cell grid,
``xl/sharedStrings.xml`` interns text cells, and each sheet's
``_rels/sheetN.xml.rels`` points at ``xl/tables/tableK.xml`` parts
that carry the *named table* objects (name + A1:D10 ref) the reference
iterates via openpyxl (wor2.py:119-144). None of that needs openpyxl —
this module parses the parts directly, so the Excel sources work in
containers without the dependency.

Scope: values only (no formula evaluation — the reference loads with
``data_only=True``, i.e. cached values, which is exactly what the XML
stores), shared/inline strings, booleans, numbers. Dates come back as
Excel serial numbers if a workbook stores them that way; the reference
workbook's WOR tables carry text + numbers only.

Workbooks are small desktop artifacts; parsing is driver-side by
design (same distribution story as the openpyxl path — the data goes
distributed at ``spark.createDataFrame``).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree

import pandas as pd

_CELL_REF_RE = re.compile(r"([A-Z]+)([0-9]+)")


def _strip(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_to_idx(letters: str) -> int:
    """'A' → 0, 'Z' → 25, 'AA' → 26."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in z.namelist():
        return []
    root = ElementTree.fromstring(z.read("xl/sharedStrings.xml"))
    out = []
    for si in root:
        out.append("".join(t.text or "" for t in si.iter() if _strip(t.tag) == "t"))
    return out


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    v_el = next((ch for ch in c if _strip(ch.tag) == "v"), None)
    if t == "inlineStr":
        return "".join(
            t_el.text or "" for t_el in c.iter() if _strip(t_el.tag) == "t"
        )
    if v_el is None or v_el.text is None:
        return None
    v = v_el.text
    if t == "s":
        return shared[int(v)]
    if t == "str":
        return v
    if t == "b":
        return v == "1"
    if t == "e":
        return None
    try:
        return int(v)
    except ValueError:
        return float(v)


def _sheet_cells(z: zipfile.ZipFile, sheet_path: str, shared: list[str]) -> dict:
    """{(row0, col0): value} for every populated cell of the sheet."""
    root = ElementTree.fromstring(z.read(sheet_path))
    cells: dict[tuple[int, int], object] = {}
    for c in root.iter():
        if _strip(c.tag) != "c":
            continue
        m = _CELL_REF_RE.match(c.get("r", ""))
        if not m:
            continue
        col, row = _col_to_idx(m.group(1)), int(m.group(2)) - 1
        cells[(row, col)] = _cell_value(c, shared)
    return cells


def _sheet_paths(z: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in workbook order (via workbook rels)."""
    return [p for _, p in _named_sheet_paths(z)]


def _named_sheet_paths(z: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet name, worksheet part path)] in workbook order."""
    wb = ElementTree.fromstring(z.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {
        r.get("Id"): r.get("Target") for r in rels if _strip(r.tag) == "Relationship"
    }
    out = []
    for s in wb.iter():
        if _strip(s.tag) != "sheet":
            continue
        rid = next(v for k, v in s.attrib.items() if k.endswith("}id") or k == "id")
        target = target_by_id[rid]
        path = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
        out.append((s.get("name") or path, path))
    return out


def _tables_for_sheet(z: zipfile.ZipFile, sheet_path: str) -> list[tuple[str, str]]:
    """[(table_name, ref)] declared by the sheet's relationship part."""
    base, _, fname = sheet_path.rpartition("/")
    rels_path = f"{base}/_rels/{fname}.rels"
    if rels_path not in z.namelist():
        return []
    rels = ElementTree.fromstring(z.read(rels_path))
    out = []
    for r in rels:
        if _strip(r.tag) != "Relationship" or not r.get("Type", "").endswith("/table"):
            continue
        target = r.get("Target", "")
        tpath = target.replace("../", "xl/") if target.startswith("../") else target
        troot = ElementTree.fromstring(z.read(tpath))
        out.append((troot.get("name") or troot.get("displayName"), troot.get("ref")))
    return out


def _slice_range(cells: dict, ref: str) -> list[list]:
    a, b = ref.split(":")
    m1, m2 = _CELL_REF_RE.match(a), _CELL_REF_RE.match(b)
    c1, r1 = _col_to_idx(m1.group(1)), int(m1.group(2)) - 1
    c2, r2 = _col_to_idx(m2.group(1)), int(m2.group(2)) - 1
    return [
        [cells.get((r, c)) for c in range(c1, c2 + 1)] for r in range(r1, r2 + 1)
    ]


def read_xlsx_tables(path: str) -> dict[str, pd.DataFrame]:
    """S4 discovery without openpyxl: every named table in the
    workbook, first row of its range as the header (the reference's
    slicing, wor2.py:136-141)."""
    out: dict[str, pd.DataFrame] = {}
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        for sheet_path in _sheet_paths(z):
            tables = _tables_for_sheet(z, sheet_path)
            if not tables:
                continue
            cells = _sheet_cells(z, sheet_path, shared)
            for name, ref in tables:
                grid = _slice_range(cells, ref)
                header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
                out[name] = pd.DataFrame(grid[1:], columns=header)
    return out


def read_xlsx_sheet(path: str, sheet: int | str = 0) -> pd.DataFrame:
    """S3 whole-sheet scan without openpyxl: first row = header
    (``pd.read_excel`` default, ventas_totales.py:87). ``sheet``
    selects by workbook index or by name, matching pd.read_excel."""
    with zipfile.ZipFile(path) as z:
        shared = _shared_strings(z)
        named = _named_sheet_paths(z)
        if isinstance(sheet, str):
            by_name = dict(named)
            if sheet not in by_name:
                raise ValueError(
                    f"{path}: no sheet named {sheet!r} (sheets: {[n for n, _ in named]})"
                )
            sheet_path = by_name[sheet]
        else:
            sheet_path = named[sheet][1]
        cells = _sheet_cells(z, sheet_path, shared)
    if not cells:
        return pd.DataFrame()
    max_r = max(r for r, _ in cells)
    max_c = max(c for _, c in cells)
    grid = [[cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)]
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    return pd.DataFrame(grid[1:], columns=header)
