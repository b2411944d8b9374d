"""Minimal RIFF/AVI container demuxer and muxer (public format: the
RIFF container spec and the AVI 'movi' chunk layout).

An AVI file is a RIFF tree: ``RIFF('AVI ' LIST('hdrl' ...) LIST('movi'
<frame chunks>))``. Video frame payloads live in the 'movi' LIST as
``##db`` (uncompressed DIB) / ``##dc`` (compressed, e.g. MJPEG) chunks,
where ``##`` is the 2-digit stream number. Sampling frames from a video
column needs exactly this much: walk the chunk tree, find 'movi',
iterate frame chunks — no codec. Decoding the frame *pixels* would need
one; the engine hashes the raw frame payloads, which is the per-frame
dedup/QC statistic a training pipeline computes anyway.

``build_avi`` is the fixture/mux twin (valid chunk layout + a minimal
'hdrl' with frame count), so tests and the driver-checked oracle query
round-trip real containers.
"""

from __future__ import annotations

import struct


def _chunks(b: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for the chunk run in
    b[start:end]; chunks pad to even length per RIFF."""
    o = start
    while o + 8 <= end:
        fourcc = b[o : o + 4]
        size = struct.unpack_from("<I", b, o + 4)[0]
        yield fourcc, o + 8, size
        o += 8 + size + (size & 1)


def is_riff_avi(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI "


def parse_avi_frames(b: bytes) -> list[bytes]:
    """Video frame payloads (``##db``/``##dc`` chunk bodies) in stream
    order from an AVI byte string. Raises ValueError on a non-AVI or
    structurally broken container."""
    if not is_riff_avi(b):
        raise ValueError("not a RIFF/AVI container")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)
    frames: list[bytes] = []
    for fourcc, po, ps in _chunks(b, 12, end):
        if fourcc != b"LIST" or b[po : po + 4] != b"movi":
            continue
        for sub, spo, sps in _chunks(b, po + 4, po + ps):
            if len(sub) == 4 and sub[2:4] in (b"db", b"dc") and sub[:2].isdigit():
                frames.append(b[spo : spo + sps])
    return frames


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def build_avi(frames: list[bytes], width: int = 2, height: int = 2) -> bytes:
    """Mux frame payloads into a minimal valid AVI: RIFF('AVI '
    LIST('hdrl' avih) LIST('movi' 00db...)). The avih MainAVIHeader
    carries the real frame count/dimensions; stream headers are omitted
    (readers that only demux — like ours — never need them)."""
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        33333,  # µs per frame (~30 fps)
        0, 0, 0,
        len(frames),  # dwTotalFrames
        0, 1,  # streams
        0,
        width, height,
        0, 0, 0, 0,
    )
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih))
    movi = _chunk(b"LIST", b"movi" + b"".join(_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
