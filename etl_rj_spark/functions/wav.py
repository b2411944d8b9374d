"""Minimal RIFF/WAVE (PCM) mux and demux — the audio twin of the AVI
demuxer in :mod:`etl_rj_spark.functions.riff` (public formats: the
RIFF container spec and the canonical WAVE ``fmt ``/``data`` chunk
layout).

A WAV file is ``RIFF('WAVE' 'fmt '<PCMWAVEFORMAT> 'data'<samples>)``.
Audio QC/dedup statistics (duration, energy, peak) need exactly this
much: find the two chunks, validate PCM16, unpack the samples — no
codec. ``build_wav`` is the fixture/mux twin so tests and the
driver-checked oracle query round-trip real containers, mirroring
``riff.build_avi``.
"""

from __future__ import annotations

import struct

from etl_rj_spark.functions.riff import _chunk, _chunks


def is_riff_wave(b: bytes) -> bool:
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def build_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Mux signed-16-bit PCM samples (interleaved if ``channels>1``)
    into a canonical WAV byte string."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(b: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, channels, samples) from a PCM16 WAV byte string.
    Raises ValueError on a non-WAVE container, a non-PCM or non-16-bit
    format, or a missing/truncated chunk."""
    if not is_riff_wave(b):
        raise ValueError("not a RIFF/WAVE container")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)
    fmt = data = None
    for fourcc, po, ps in _chunks(b, 12, end):
        if fourcc == b"fmt " and ps >= 16:
            if po + 16 > len(b):
                raise ValueError("fmt chunk truncated")
            fmt = b[po : po + 16]
        elif fourcc == b"data":
            data = b[po : po + ps]
            if po + ps > len(b):
                raise ValueError("data chunk truncated")
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt)
    if audio_fmt != 1 or bits != 16:
        raise ValueError(f"unsupported format: fmt={audio_fmt} bits={bits}")
    n = len(data) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", data[: 2 * n]))
