"""Dependency-free legacy ``.xls`` (BIFF8) reader — S3 parity for the
reference's extension dispatch, which accepts ``.xls`` via
``pd.read_excel`` (ventas_totales.py:80-90).

A legacy .xls is an OLE2/CFB compound file ([MS-CFB], public spec)
containing a ``Workbook`` stream of BIFF8 records ([MS-XLS], public
spec). This module implements the minimal honest subset:

- CFB: header, DIFAT, FAT chains, directory tree, and the mini-stream
  (streams under the 4096-byte cutoff live in 64-byte mini sectors
  inside the root entry's stream, chained by the miniFAT).
- BIFF8: BOF/EOF bracketing, BOUNDSHEET sheet catalog, SST shared
  strings (including CONTINUE splits, where a string's character data
  resumes under a freshly restated encoding flag), and the cell
  records LABELSST, LABEL, RSTRING, NUMBER, RK, MULRK, BOOLERR, and
  FORMULA cached results (with trailing STRING records) — i.e. cached
  *values*, exactly what ``data_only=True`` loads read.

Unknown records are skipped by design (real exports carry dozens of
formatting records the values don't need). Like the XLSX parser,
workbooks are small desktop artifacts: parsing is driver-side, the
data goes distributed at ``spark.createDataFrame``.
"""

from __future__ import annotations

import struct

import pandas as pd

OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF


class XlsFormatError(ValueError):
    """The file is not a readable BIFF8 .xls workbook."""


# ---------------------------------------------------------------------------
# CFB (OLE2 compound file) — [MS-CFB]
# ---------------------------------------------------------------------------


def _u16(b: bytes, o: int) -> int:
    return struct.unpack_from("<H", b, o)[0]


def _u32(b: bytes, o: int) -> int:
    return struct.unpack_from("<I", b, o)[0]


class _Cfb:
    def __init__(self, data: bytes):
        if len(data) < 512 or data[:8] != OLE2_MAGIC:
            raise XlsFormatError("not an OLE2 compound file")
        self.data = data
        sector_shift = _u16(data, 30)
        mini_shift = _u16(data, 32)
        if sector_shift not in (9, 12) or mini_shift != 6:
            raise XlsFormatError(f"unsupported CFB sector shift {sector_shift}/{mini_shift}")
        self.ssz = 1 << sector_shift
        self.mssz = 1 << mini_shift
        self.mini_cutoff = _u32(data, 56)
        self.first_dir = _u32(data, 48)
        first_minifat, n_minifat = _u32(data, 60), _u32(data, 64)
        first_difat, n_difat = _u32(data, 68), _u32(data, 72)

        # DIFAT: 109 header entries + chained DIFAT sectors
        difat = [ _u32(data, 76 + 4 * i) for i in range(109) ]
        s = first_difat
        for _ in range(n_difat):
            if s in (_ENDOFCHAIN, _FREESECT):
                break
            sec = self._sector(s)
            difat.extend(_u32(sec, 4 * i) for i in range(self.ssz // 4 - 1))
            s = _u32(sec, self.ssz - 4)
        self.fat: list[int] = []
        for fs in difat:
            if fs in (_FREESECT, _ENDOFCHAIN):
                continue
            sec = self._sector(fs)
            self.fat.extend(_u32(sec, 4 * i) for i in range(self.ssz // 4))

        # miniFAT (sector chain in the regular FAT)
        self.minifat: list[int] = []
        s = first_minifat
        for _ in range(n_minifat):
            if s in (_ENDOFCHAIN, _FREESECT):
                break
            sec = self._sector(s)
            self.minifat.extend(_u32(sec, 4 * i) for i in range(self.ssz // 4))
            s = self.fat[s] if s < len(self.fat) else _ENDOFCHAIN

        self.dir_entries = self._read_directory()
        root = next((e for e in self.dir_entries if e["type"] == 5), None)
        if root is None:
            raise XlsFormatError("CFB has no root directory entry")
        self.ministream = self._read_chain(root["start"], root["size"])

    def _sector(self, n: int) -> bytes:
        off = 512 + n * self.ssz
        if off + self.ssz > len(self.data):
            raise XlsFormatError(f"sector {n} out of bounds")
        return self.data[off : off + self.ssz]

    def _read_chain(self, start: int, size: int) -> bytes:
        out, s, guard = [], start, 0
        while s not in (_ENDOFCHAIN, _FREESECT):
            if s >= len(self.fat) or guard > len(self.fat):
                raise XlsFormatError("broken FAT chain")
            out.append(self._sector(s))
            s = self.fat[s]
            guard += 1
        return b"".join(out)[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out, s, guard = [], start, 0
        while s not in (_ENDOFCHAIN, _FREESECT):
            if s >= len(self.minifat) or guard > len(self.minifat) + 1:
                raise XlsFormatError("broken miniFAT chain")
            out.append(self.ministream[s * self.mssz : (s + 1) * self.mssz])
            s = self.minifat[s]
            guard += 1
        return b"".join(out)[:size]

    def _read_directory(self) -> list[dict]:
        raw = self._raw_chain(self.first_dir)
        entries = []
        for off in range(0, len(raw) - 127, 128):
            e = raw[off : off + 128]
            name_len = _u16(e, 64)
            etype = e[66]
            if etype == 0:
                continue
            name = e[: max(0, name_len - 2)].decode("utf-16-le", errors="replace")
            entries.append(
                {
                    "name": name,
                    "type": etype,  # 5 = root storage, 2 = stream
                    "start": _u32(e, 116),
                    "size": struct.unpack_from("<Q", e, 120)[0] & 0xFFFFFFFF,
                }
            )
        return entries

    def _raw_chain(self, start: int) -> bytes:
        """Full sector chain without a size cap (directory has none)."""
        out, s, guard = [], start, 0
        while s not in (_ENDOFCHAIN, _FREESECT):
            if s >= len(self.fat) or guard > len(self.fat):
                raise XlsFormatError("broken FAT chain")
            out.append(self._sector(s))
            s = self.fat[s]
            guard += 1
        return b"".join(out)

    def open_stream(self, *names: str) -> bytes:
        for e in self.dir_entries:
            if e["type"] == 2 and e["name"].lower() in {n.lower() for n in names}:
                if e["size"] < self.mini_cutoff:
                    return self._read_mini_chain(e["start"], e["size"])
                return self._read_chain(e["start"], e["size"])
        raise XlsFormatError(f"no stream named {names} in compound file")


# ---------------------------------------------------------------------------
# BIFF8 records — [MS-XLS]
# ---------------------------------------------------------------------------

_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_LABEL = 0x0204
_RSTRING = 0x00D6
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207


def _records(stream: bytes):
    """Yield (opcode, offset_of_record, payload) for every BIFF record."""
    o, n = 0, len(stream)
    while o + 4 <= n:
        op, ln = struct.unpack_from("<HH", stream, o)
        yield op, o, stream[o + 4 : o + 4 + ln]
        o += 4 + ln


class _SegReader:
    """Byte reader over SST payload segments (SST record + CONTINUEs).
    A unicode string's character run may split at a segment boundary,
    where the continuation restates its own compressed/utf16 flag byte
    — the one genuinely tricky part of BIFF8."""

    def __init__(self, segments: list[bytes]):
        self.segs = segments
        self.i = 0
        self.o = 0

    def remaining_in_seg(self) -> int:
        return len(self.segs[self.i]) - self.o if self.i < len(self.segs) else 0

    def _advance_seg(self):
        self.i += 1
        self.o = 0

    def read(self, n: int) -> bytes:
        out = b""
        while n > 0:
            if self.i >= len(self.segs):
                raise XlsFormatError("SST truncated")
            if self.remaining_in_seg() == 0:
                self._advance_seg()
                continue
            take = min(n, self.remaining_in_seg())
            out += self.segs[self.i][self.o : self.o + take]
            self.o += take
            n -= take
        return out

    def read_u8(self) -> int:
        return self.read(1)[0]

    def read_u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def read_xl_unicode_string(self) -> str:
        """XLUnicodeRichExtendedString: cch, flags, optional rich/ext
        sizes, character data (possibly split across CONTINUEs with a
        restated flag byte), then rich-run / ext bytes to skip."""
        cch = self.read_u16()
        flags = self.read_u8()
        c_run = self.read_u16() if flags & 0x08 else 0
        cb_ext = self.read_u32() if flags & 0x04 else 0
        high = bool(flags & 0x01)
        # accumulate UTF-16LE bytes and decode ONCE at the end: a
        # CONTINUE split between the halves of a surrogate pair (legal
        # — splits happen at code-unit granularity) would break
        # per-segment decoding
        buf = bytearray()
        need = cch  # cch counts UTF-16 code units
        while need > 0:
            if self.remaining_in_seg() == 0:
                # crossing into a CONTINUE: it restates the flag byte
                self._advance_seg()
                if self.i >= len(self.segs):
                    raise XlsFormatError("SST truncated mid-string")
                high = bool(self.read_u8() & 0x01)
            avail = self.remaining_in_seg()
            per = 2 if high else 1
            take = min(need, avail // per)
            if take == 0:
                # a code unit's bytes can't split across segments
                raise XlsFormatError("SST continuation split inside a code unit")
            raw = self.read(take * per)
            if high:
                buf += raw
            else:
                buf += raw.decode("latin-1").encode("utf-16-le")
            need -= take
        self.read(c_run * 4)  # rich formatting runs (FormatRun = 4 bytes)
        self.read(cb_ext)  # ExtRst
        return buf.decode("utf-16-le")


def _parse_sst(segments: list[bytes]) -> list[str]:
    r = _SegReader(segments)
    r.read_u32()  # cstTotal
    unique = r.read_u32()
    return [r.read_xl_unicode_string() for _ in range(unique)]


def _short_unicode_string(b: bytes, o: int) -> str:
    """ShortXLUnicodeString (sheet names): cch u8, flags u8, chars."""
    cch, flags = b[o], b[o + 1]
    if flags & 0x01:
        return b[o + 2 : o + 2 + 2 * cch].decode("utf-16-le")
    return b[o + 2 : o + 2 + cch].decode("latin-1")


def _decode_rk(rk: int) -> float | int:
    val: float | int
    if rk & 0x02:  # integer: top 30 bits, sign-extended
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        val = v
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if rk & 0x01:
        return val / 100
    return val


def _parse_sheet(stream: bytes, start: int, sst: list[str]) -> dict[tuple[int, int], object]:
    """{(row, col): value} for one worksheet substream."""
    cells: dict[tuple[int, int], object] = {}
    depth = 0
    pending_formula_cell: tuple[int, int] | None = None
    pending_string: list[bytes] | None = None

    def _flush_pending_string() -> None:
        """Decode a FORMULA's cached STRING (+ trailing CONTINUEs)."""
        nonlocal pending_formula_cell, pending_string
        if pending_string is None or pending_formula_cell is None:
            pending_string = None
            return
        try:
            cells[pending_formula_cell] = _SegReader(pending_string).read_xl_unicode_string()
        except XlsFormatError:
            # truncated cached result: lose the one cell, not the workbook
            cells[pending_formula_cell] = None
        pending_formula_cell = None
        pending_string = None

    for op, off, p in _records(stream):
        if off < start:
            continue
        if pending_string is not None:
            if op == _CONTINUE:
                pending_string.append(p)
                continue
            _flush_pending_string()
        if op == _BOF:
            depth += 1
            if depth > 1:
                break  # ran into the next substream
            continue
        if op == _EOF:
            break
        if op == _LABELSST:
            r, c, _ixfe, isst = struct.unpack_from("<HHHI", p)
            cells[(r, c)] = sst[isst] if isst < len(sst) else None
        elif op in (_LABEL, _RSTRING):
            r, c = struct.unpack_from("<HH", p)
            cch = _u16(p, 6)
            flags = p[8]
            if flags & 0x01:
                cells[(r, c)] = p[9 : 9 + 2 * cch].decode("utf-16-le")
            else:
                cells[(r, c)] = p[9 : 9 + cch].decode("latin-1")
        elif op == _NUMBER:
            r, c, _ixfe = struct.unpack_from("<HHH", p)
            cells[(r, c)] = struct.unpack_from("<d", p, 6)[0]
        elif op == _RK:
            r, c, _ixfe, rk = struct.unpack_from("<HHHI", p)
            cells[(r, c)] = _decode_rk(rk)
        elif op == _MULRK:
            r, c0 = struct.unpack_from("<HH", p)
            n = (len(p) - 6) // 6
            for i in range(n):
                rk = _u32(p, 4 + 6 * i + 2)
                cells[(r, c0 + i)] = _decode_rk(rk)
        elif op == _BOOLERR:
            r, c, _ixfe, v, is_err = struct.unpack_from("<HHHBB", p)
            cells[(r, c)] = None if is_err else bool(v)
        elif op == _FORMULA:
            r, c = struct.unpack_from("<HH", p)
            result = p[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # string: value arrives in a STRING record
                    pending_formula_cell = (r, c)
                elif kind == 1:
                    cells[(r, c)] = bool(result[2])
                elif kind == 3:
                    cells[(r, c)] = ""
                else:  # error
                    cells[(r, c)] = None
            else:
                cells[(r, c)] = struct.unpack("<d", result)[0]
        elif op == _STRING and pending_formula_cell is not None:
            # a long cached result spills into CONTINUE records; collect
            # them before decoding (same segment model as the SST pass)
            pending_string = [p]
    _flush_pending_string()
    return cells


def read_xls_sheets(path: str) -> dict[str, dict[tuple[int, int], object]]:
    """Every worksheet's populated cells, keyed by sheet name (workbook
    order preserved — dicts iterate in insertion order)."""
    with open(path, "rb") as f:
        cfb = _Cfb(f.read())
    stream = cfb.open_stream("Workbook", "Book")

    # workbook-globals pass: sheet catalog + shared strings
    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    sst_segments: list[bytes] = []
    collecting_sst = False
    for op, _off, p in _records(stream):
        if op == _BOUNDSHEET:
            pos = _u32(p, 0)
            # hidden sheets (grbit & 0x03) stay in the catalog: they
            # parse fine, and dropping them would shift integer sheet
            # indices relative to pd.read_excel/xlrd, which count them
            sheets.append((_short_unicode_string(p, 6), pos))
            collecting_sst = False
        elif op == _SST:
            sst_segments = [p]
            collecting_sst = True
        elif op == _CONTINUE and collecting_sst:
            sst_segments.append(p)
        elif op == _EOF:
            break  # end of globals substream
        else:
            collecting_sst = False
    sst = _parse_sst(sst_segments) if sst_segments else []

    return {name: _parse_sheet(stream, pos, sst) for name, pos in sheets}


def read_xls_sheet(path: str, sheet: int | str = 0) -> pd.DataFrame:
    """S3 whole-sheet scan for legacy .xls: first row = header (the
    ``pd.read_excel`` default the reference relies on,
    ventas_totales.py:87) — same contract as
    ``xlsx_native.read_xlsx_sheet``. ``sheet`` selects by workbook
    index or by name (both forms ``pd.read_excel`` honors)."""
    all_sheets = read_xls_sheets(path)
    if isinstance(sheet, str):
        if sheet not in all_sheets:
            raise XlsFormatError(
                f"workbook has no sheet named {sheet!r} (sheets: {list(all_sheets)})"
            )
        cells = all_sheets[sheet]
    elif sheet >= len(all_sheets):
        raise XlsFormatError(f"workbook has {len(all_sheets)} sheets, wanted index {sheet}")
    else:
        cells = list(all_sheets.values())[sheet]
    if not cells:
        return pd.DataFrame()
    max_r = max(r for r, _ in cells)
    max_c = max(c for _, c in cells)
    grid = [[cells.get((r, c)) for c in range(max_c + 1)] for r in range(max_r + 1)]
    header = [str(h) if h is not None else f"col{i}" for i, h in enumerate(grid[0])]
    return pd.DataFrame(grid[1:], columns=header)
