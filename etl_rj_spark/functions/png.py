"""Dependency-free PNG codec (stdlib ``zlib``/``struct`` + numpy) —
the real decode behind the multimodal operators in containers without
an imaging library.

Scope: 8-bit-depth, non-interlaced PNGs — grayscale (color type 0),
RGB (2), palette (3), gray+alpha (4), RGBA (6) — with all five
scanline filters (None/Sub/Up/Average/Paeth). That covers everything
:func:`encode_png` produces and the vast majority of real-world PNGs;
16-bit and Adam7-interlaced files raise a clear ``ValueError`` so a
pipeline can quarantine them instead of mis-decoding.

Performance note: filters Sub/Average/Paeth have a per-byte left
dependency, so those scanlines reconstruct in a Python loop — fine for
the thumbnail-scale images these operators process per Arrow batch; at
production scale you would swap :mod:`PIL`/libvips into the same
``mapInPandas`` seam (operators/multimodal.py), which is exactly why
the decode is isolated here.
"""

from __future__ import annotations

import binascii
import struct
import zlib

import numpy as np

#: PNG file signature.
SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODE = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (RFC 2083 §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an HxW (grayscale), HxWx3 (RGB) or HxWx4 (RGBA) uint8
    array as a PNG. ``filter_type`` applies one scanline filter to
    every row (0=None default; 1..4 exist mainly so the decoder's
    filter reconstruction is roundtrip-testable)."""
    arr = np.ascontiguousarray(np.asarray(arr, dtype=np.uint8))
    if arr.ndim == 2:
        color_type = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type = 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    bpp = _CHANNELS[color_type]
    raw = arr.reshape(h, w * bpp).astype(np.int64)
    zeros = np.zeros(bpp, dtype=np.int64)
    prev = np.zeros(w * bpp, dtype=np.int64)
    lines = []
    for y in range(h):
        line = raw[y]
        left = np.concatenate([zeros, line[:-bpp]]) if w * bpp > bpp else np.zeros_like(line)
        upleft = np.concatenate([zeros, prev[:-bpp]]) if w * bpp > bpp else np.zeros_like(line)
        if filter_type == 0:
            filt = line
        elif filter_type == 1:
            filt = line - left
        elif filter_type == 2:
            filt = line - prev
        elif filter_type == 3:
            filt = line - (left + prev) // 2
        elif filter_type == 4:
            filt = line - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"filter_type {filter_type}")
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> tuple[np.ndarray, str]:
    """Decode a PNG to ``(uint8 array, mode)``: HxW for mode 'L',
    HxWxC otherwise (palette images are expanded to RGB). Raises
    ``ValueError`` on non-PNG bytes and on the unsupported corners
    (16-bit depth, interlacing)."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr, plte = 8, [], None, None
    while pos + 8 <= len(data):
        ln, tag = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # chunk + CRC
        if tag == b"IHDR":
            try:
                ihdr = struct.unpack(">IIBBBBB", chunk)
            except struct.error as ex:  # truncated IHDR: length field lied
                raise ValueError(f"truncated IHDR chunk: {ex}") from ex
        elif tag == b"IDAT":
            idat.append(chunk)
        elif tag == b"PLTE":
            plte = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if interlace != 0:
        raise ValueError("Adam7 interlacing unsupported")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported color type {ctype}")
    bpp = _CHANNELS[ctype]
    stride = w * bpp
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as ex:  # corrupt deflate stream inside IDAT
        raise ValueError(f"corrupt IDAT deflate stream: {ex}") from ex
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos = 0
    for y in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int64)
        pos += 1 + stride
        if f == 0:
            rec = line
        elif f == 2:
            rec = (line + prev) % 256
        elif f in (1, 3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):  # left-dependency → sequential
                left = rec[x - bpp] if x >= bpp else 0
                if f == 1:
                    rec[x] = (line[x] + left) % 256
                elif f == 3:
                    rec[x] = (line[x] + (left + prev[x]) // 2) % 256
                else:
                    ul = prev[x - bpp] if x >= bpp else 0
                    p = left + prev[x] - ul
                    pa, pb, pc = abs(p - left), abs(p - prev[x]), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (prev[x] if pb <= pc else ul)
                    rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"bad scanline filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        return plte[out.reshape(h, w)], "RGB"
    if bpp == 1:
        return out.reshape(h, w), _MODE[ctype]
    return out.reshape(h, w, bpp), _MODE[ctype]


def resize_nearest(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (index = floor(i*in/out),
    engine-portable integer arithmetic — no rounding-mode ambiguity)."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return arr[ys][:, xs]
