"""Minimal BIFF8 ``.xls`` writer — the legacy-compat sink twin of
``sinks/xlsx.py`` (the reference lives in an Excel-centric desktop
world; some downstream consumers still require .xls). Implements the
subset of [MS-CFB] + [MS-XLS] needed for structurally valid legacy
workbooks: both CFB layouts (mini-stream under the 4096-byte cutoff,
regular FAT above), SST shared strings with optional CONTINUE splits,
and RK/NUMBER/LABELSST/BOOLERR cell records. Cells only — no
formatting records (XF/FONT/INDEX), which readers skip anyway.

Also the fixture generator for ``sources/xls_biff.py``'s tests and the
driver-checked S3 .xls roundtrip query.
"""


from __future__ import annotations

import struct

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_NOSTREAM = 0xFFFFFFFF

OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"


class FormulaString(str):
    """Grid-cell marker: emit this value as a FORMULA record whose
    cached string result follows in a trailing STRING record (how a
    text formula's ``data_only`` value is stored) instead of a
    LABELSST — exercises the reader's pending-STRING path."""


def _record(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _bof(dt: int) -> bytes:
    # vers=0x0600 (BIFF8), dt, rupBuild, rupYear, bfh, sfo
    return _record(0x0809, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 0, 0))


def _xl_string_payload(s: str) -> tuple[bytes, bytes, bool]:
    """(header cch+flags, char bytes, is_utf16). BIFF cch counts UTF-16
    code units, not code points — astral-plane chars are 2 units."""
    try:
        raw = s.encode("latin-1")
        return struct.pack("<HB", len(raw), 0), raw, False
    except UnicodeEncodeError:
        raw = s.encode("utf-16-le")
        return struct.pack("<HB", len(raw) // 2, 1), raw, True


def _sst_records(strings: list[str], split_mid_string: int | None = None) -> bytes:
    """SST (+ optional CONTINUE that splits one string's characters,
    restating the flag byte — the hard BIFF8 case)."""
    segments = [struct.pack("<II", len(strings), len(strings))]
    for i, s in enumerate(strings):
        hdr, raw, utf16 = _xl_string_payload(s)
        if i == split_mid_string and len(s) >= 2:
            per = 2 if utf16 else 1
            segments[-1] += hdr + raw[:per]  # first char stays in SST
            # CONTINUE: restated flag byte + the remaining chars
            segments.append(bytes([1 if utf16 else 0]) + raw[per:])
        else:
            segments[-1] += hdr + raw
    out = _record(0x00FC, segments[0])
    for seg in segments[1:]:
        out += _record(0x003C, seg)
    return out


def build_workbook_stream(
    sheets: dict[str, list[list]],
    split_sst_mid_string: int | None = None,
    hidden: frozenset[str] | set[str] = frozenset(),
    split_string_result: bool = False,
) -> bytes:
    """BIFF8 Workbook stream: globals (BOF, BOUNDSHEETs, SST, EOF) then
    one worksheet substream per sheet. Sheets named in ``hidden`` get
    the BOUNDSHEET hidden state; ``split_string_result`` splits each
    FORMULA cached-string STRING record into STRING + CONTINUE."""
    strings: list[str] = []
    str_idx: dict[str, int] = {}
    for grid in sheets.values():
        for row in grid:
            for v in row:
                if (
                    isinstance(v, str)
                    and not isinstance(v, FormulaString)
                    and v not in str_idx
                ):
                    str_idx[v] = len(strings)
                    strings.append(v)

    sheet_streams: list[bytes] = []
    for grid in sheets.values():
        body = _bof(0x0010)  # worksheet
        for r, row in enumerate(grid):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, FormulaString):
                    # FORMULA: string-result marker (kind 0, tail 0xFFFF),
                    # empty rgce — the cached value rides in STRING
                    result = b"\x00\x00\x00\x00\x00\x00\xff\xff"
                    body += _record(
                        0x0006,
                        struct.pack("<HHH", r, c, 0)
                        + result
                        + struct.pack("<HIH", 0, 0, 0),
                    )
                    hdr, raw, utf16 = _xl_string_payload(str(v))
                    if split_string_result and len(v) >= 2:
                        per = 2 if utf16 else 1
                        body += _record(0x0207, hdr + raw[:per])
                        body += _record(
                            0x003C, bytes([1 if utf16 else 0]) + raw[per:]
                        )
                    else:
                        body += _record(0x0207, hdr + raw)
                elif isinstance(v, str):
                    body += _record(
                        0x00FD, struct.pack("<HHHI", r, c, 0, str_idx[v])
                    )
                elif isinstance(v, bool):
                    body += _record(0x0205, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                elif isinstance(v, int) and -(2**29) <= v < 2**29:
                    rk = ((v & 0x3FFFFFFF) << 2) | 0x02
                    body += _record(0x027E, struct.pack("<HHHI", r, c, 0, rk))
                else:
                    body += _record(0x0203, struct.pack("<HHHd", r, c, 0, float(v)))
        body += _record(0x000A, b"")
        sheet_streams.append(body)

    sst = _sst_records(strings, split_sst_mid_string) if strings else b""

    # globals size is fixed once BOUNDSHEET payload sizes are known
    bs_payloads = []
    for name in sheets:
        raw = name.encode("latin-1")
        grbit = 0x0001 if name in hidden else 0  # hsState: hidden
        bs_payloads.append(struct.pack("<IHBB", 0, grbit, len(raw), 0) + raw)
    globals_len = (
        len(_bof(0x0005))
        + sum(4 + len(p) for p in bs_payloads)
        + len(sst)
        + 4  # EOF
    )
    out = _bof(0x0005)
    pos = globals_len
    for p, body in zip(bs_payloads, sheet_streams):
        out += _record(0x0085, struct.pack("<I", pos) + p[4:])
        pos += len(body)
    out += sst + _record(0x000A, b"")
    assert len(out) == globals_len
    return out + b"".join(sheet_streams)


def _dir_entry(name: str, etype: int, start: int, size: int, child: int = _NOSTREAM) -> bytes:
    raw = name.encode("utf-16-le")
    e = raw + b"\x00" * (64 - len(raw))
    e += struct.pack("<HBB", len(raw) + 2, etype, 1)  # nameLen, type, black
    e += struct.pack("<III", _NOSTREAM, _NOSTREAM, child)  # siblings, child
    e += b"\x00" * 16  # CLSID
    e += struct.pack("<I", 0)  # state
    e += b"\x00" * 16  # ctime/mtime
    e += struct.pack("<IQ", start, size)
    assert len(e) == 128
    return e


def wrap_cfb(stream: bytes, force_large: bool = False) -> bytes:
    """Wrap a Workbook stream in a v3 CFB container (512-byte sectors).
    Streams < 4096 bytes go through the mini-stream unless
    ``force_large`` pads them past the cutoff."""
    if force_large and len(stream) < 4096:
        # pad AFTER the final EOF record with zero bytes — record
        # iteration stops at stream end; readers must tolerate slack
        stream = stream + b"\x00" * (4096 - len(stream))

    def pad(b: bytes, unit: int) -> bytes:
        return b + b"\x00" * ((-len(b)) % unit)

    if len(stream) < 4096:
        # sectors: 0=FAT, 1=dir, 2=miniFAT, 3..=ministream container
        n_mini = (len(stream) + 63) // 64
        container = pad(stream, 512)
        n_cont = len(container) // 512
        fat = [_FATSECT, _ENDOFCHAIN, _ENDOFCHAIN]
        for i in range(n_cont):
            fat.append(3 + i + 1 if i + 1 < n_cont else _ENDOFCHAIN)
        fat += [_FREESECT] * (128 - len(fat))
        minifat = [
            i + 1 if i + 1 < n_mini else _ENDOFCHAIN for i in range(n_mini)
        ] + [_FREESECT] * (128 - n_mini)
        directory = (
            _dir_entry("Root Entry", 5, 3, len(container), child=1)
            + _dir_entry("Workbook", 2, 0, len(stream))
            + b"\x00" * 256
        )
        sectors = (
            b"".join(struct.pack("<I", x) for x in fat)
            + directory
            + b"".join(struct.pack("<I", x) for x in minifat)
            + container
        )
        first_minifat, n_minifat = 2, 1
    else:
        # sectors: 0=FAT, 1=dir, 2..=stream
        data = pad(stream, 512)
        n_data = len(data) // 512
        assert n_data <= 125, "test writer supports ≤ ~63KB streams"
        fat = [_FATSECT, _ENDOFCHAIN]
        for i in range(n_data):
            fat.append(2 + i + 1 if i + 1 < n_data else _ENDOFCHAIN)
        fat += [_FREESECT] * (128 - len(fat))
        directory = (
            _dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
            + _dir_entry("Workbook", 2, 2, len(stream))
            + b"\x00" * 256
        )
        sectors = (
            b"".join(struct.pack("<I", x) for x in fat) + directory + data
        )
        first_minifat, n_minifat = _ENDOFCHAIN, 0

    header = OLE2_MAGIC
    header += b"\x00" * 16  # CLSID
    header += struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3)
    header += struct.pack("<H", 0xFFFE)  # little-endian
    header += struct.pack("<HH", 9, 6)  # sector shift 512, mini 64
    header += b"\x00" * 6  # reserved
    header += struct.pack("<I", 0)  # num dir sectors (v3: 0)
    header += struct.pack("<I", 1)  # num FAT sectors
    header += struct.pack("<I", 1)  # first dir sector
    header += struct.pack("<I", 0)  # transaction
    header += struct.pack("<I", 4096)  # mini cutoff
    header += struct.pack("<II", first_minifat, n_minifat)
    header += struct.pack("<II", _ENDOFCHAIN, 0)  # DIFAT chain: none
    difat = [0] + [_FREESECT] * 108
    header += b"".join(struct.pack("<I", x) for x in difat)
    assert len(header) == 512
    return header + sectors


def write_xls(
    path: str,
    sheets: dict[str, list[list]],
    force_large: bool = False,
    split_sst_mid_string: int | None = None,
    hidden: frozenset[str] | set[str] = frozenset(),
    split_string_result: bool = False,
) -> None:
    stream = build_workbook_stream(
        sheets, split_sst_mid_string, hidden=hidden, split_string_result=split_string_result
    )
    with open(path, "wb") as f:
        f.write(wrap_cfb(stream, force_large=force_large))
