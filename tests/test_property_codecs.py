"""Property-based roundtrips for the binary-format codecs: BIFF8 .xls
(writer → reader) and RIFF/AVI (mux → demux) must be exact for
arbitrary inputs — hypothesis hunts the encoding edges (empty strings,
astral-plane chars, RK integer bounds, odd-length frames)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_rj_spark.functions.riff import build_avi, parse_avi_frames
from etl_rj_spark.sinks.xls_legacy import write_xls
from etl_rj_spark.sources.xls_biff import read_xls_sheet

# BMP + astral text, no surrogates (unpaired surrogates aren't strings)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
)
_cell = st.one_of(
    _text,
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@st.composite
def _grids(draw):
    n_cols = draw(st.integers(1, 5))
    n_rows = draw(st.integers(0, 6))
    header = [f"c{i}_{draw(_text)}" for i in range(n_cols)]
    rows = [
        [draw(_cell) for _ in range(n_cols)] for _ in range(n_rows)
    ]
    return [header] + rows


def _norm(v):
    """What the BIFF cell encoding preserves: ints beyond the RK 30-bit
    window are written as NUMBER doubles."""
    if isinstance(v, bool) or isinstance(v, str):
        return v
    if isinstance(v, int) and not (-(2**29) <= v < 2**29):
        return float(v)
    return v


@settings(max_examples=40, deadline=None)
@given(grid=_grids())
def test_xls_roundtrip_property(tmp_path_factory, grid):
    p = str(tmp_path_factory.mktemp("xlsprop") / "g.xls")
    write_xls(p, {"S": grid})
    pdf = read_xls_sheet(p)
    # header row: cells become the column labels
    assert list(pdf.columns) == grid[0]
    # the reader trims trailing all-None rows/cols (sparse cell grid) —
    # compare only populated cells
    for r, row in enumerate(grid[1:]):
        for c, v in enumerate(row):
            if r < len(pdf) and c < pdf.shape[1]:
                got = pdf.iloc[r, c]
                want = _norm(v)
                assert got == want or (got is None and want is None), (r, c, got, want)


@settings(max_examples=50, deadline=None)
@given(frames=st.lists(st.binary(max_size=300), max_size=16))
def test_avi_roundtrip_property(frames):
    assert parse_avi_frames(build_avi(frames)) == frames


@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=400),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(1, 2),
)
@settings(max_examples=60, deadline=None)
def test_wav_roundtrip_property(samples, rate, channels):
    from etl_rj_spark.functions.wav import build_wav, parse_wav

    # interleaved sample count must divide evenly across channels
    samples = samples[: len(samples) - (len(samples) % channels)]
    got_rate, got_ch, got = parse_wav(build_wav(samples, rate, channels))
    assert (got_rate, got_ch, got) == (rate, channels, samples)


def test_wav_rejects_non_wave_and_bad_formats():
    import struct

    import pytest as _pytest

    from etl_rj_spark.functions.riff import _chunk
    from etl_rj_spark.functions.wav import build_wav, parse_wav

    with _pytest.raises(ValueError, match="not a RIFF/WAVE"):
        parse_wav(b"plainly not audio")
    # valid RIFF/WAVE but non-PCM format code (e.g. IEEE float = 3)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", b"\0\0")
    bad = b"RIFF" + struct.pack("<I", len(body)) + body
    with _pytest.raises(ValueError, match="unsupported format"):
        parse_wav(bad)
    # truncated data chunk: header claims more bytes than exist
    wav = bytearray(build_wav([1, 2, 3]))
    with _pytest.raises(ValueError, match="truncated"):
        parse_wav(bytes(wav[:-4]))
