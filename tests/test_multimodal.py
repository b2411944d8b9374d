"""Multimodal plumbing: binary payload shape, Arrow-batched feature
extraction, aspect-preserving resize, and row-expanding frame sampling
— deterministic decode stand-ins, real execution paths."""

from __future__ import annotations

from etl_rj_spark.operators.multimodal import (
    resize_images,
    sample_frames,
    with_binary_payload,
)
from etl_rj_spark.sources.parquet import read_parquet_table


def _payloads(spark, sf_dir):
    d = read_parquet_table(spark, f"{sf_dir}/documents.parquet")
    return with_binary_payload(d, "doc_id", "text")


def test_resize_preserves_aspect_and_bounds(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    rows = resize_images(p, max_side=128).collect()
    assert len(rows) == p.count()
    for r in rows:
        assert max(r.out_width, r.out_height) <= 128
        if max(r.width, r.height) <= 128:  # no upscaling
            assert (r.out_width, r.out_height) == (r.width, r.height)
        else:  # both sides scaled by the same factor, rounded
            scale = 128 / max(r.width, r.height)
            assert r.out_width == max(1, round(r.width * scale))
            assert r.out_height == max(1, round(r.height * scale))


def test_sample_frames_quarantines_non_containers(spark, sf_dir):
    """Text payloads are not demuxable containers: each doc yields
    exactly one quarantine row and ZERO frame rows — no fabricated
    frames for bytes the engine can't demux."""
    p = _payloads(spark, sf_dir)
    got = sample_frames(p, every_n=10).collect()
    assert len(got) == p.count()
    assert all(r.skip_reason == "not_riff_avi" for r in got)
    assert all(r.frame_idx is None and r.frame_md5 is None for r in got)


def test_multimodal_partitioning_invariance(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    one = {(r.doc_id, r.frame_idx, r.frame_md5) for r in sample_frames(p).collect()}
    many = {
        (r.doc_id, r.frame_idx, r.frame_md5)
        for r in sample_frames(p.repartition(7)).collect()
    }
    assert one == many and len(one) > 0


def test_parse_image_header_native(spark):
    """PNG/GIF dims parsed from raw bytes with built-in functions only
    — no imaging library, unknown magic yields nulls."""
    import struct

    from etl_rj_spark.operators.multimodal import parse_image_header

    def png(w, h):
        return (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"crc0"
        )

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 5

    def jpeg(w, h, *, app1_len=0, progressive=False, fill=False, truncated=False):
        """SOI + APP0(JFIF) [+ big APP1] [+ fill byte] + DQT + SOF."""
        b = b"\xff\xd8"
        b += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        if app1_len:  # EXIF-style segment, skipped via its length chain
            b += b"\xff\xe1" + struct.pack(">H", app1_len + 2) + b"\x00" * app1_len
        if fill:
            b += b"\xff"  # fill byte before the next marker
        b += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" * 65
        if truncated:
            return b + b"\xff\xda"  # SOS with no SOF ever seen
        sof = b"\xff\xc2" if progressive else b"\xff\xc0"
        b += sof + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
        return b

    rows = [
        (1, bytearray(png(640, 480))),
        (2, bytearray(gif(320, 200))),
        (3, bytearray(jpeg(1024, 768))),
        (4, bytearray(b"not an image at all")),
        (5, bytearray(jpeg(800, 600, app1_len=3000, progressive=True, fill=True))),
        (6, bytearray(jpeg(0, 0, truncated=True))),
        (7, bytearray(b"\xff\xd8\xff\xe0rest-of-jpeg")),
    ]
    df = spark.createDataFrame(rows, "doc_id int, content binary")
    got = {r.doc_id: r for r in parse_image_header(df).collect()}
    assert (got[1].img_format, got[1].img_width, got[1].img_height) == ("png", 640, 480)
    assert (got[2].img_format, got[2].img_width, got[2].img_height) == ("gif", 320, 200)
    assert (got[3].img_format, got[3].img_width, got[3].img_height) == ("jpeg", 1024, 768)
    assert got[4].img_format is None and got[4].img_height is None
    # progressive SOF2 behind a 3 KB APP1 and a fill byte still resolves
    assert (got[5].img_width, got[5].img_height) == (800, 600)
    # SOS before any SOF, or a broken chain → nulls, never garbage
    assert got[6].img_format == "jpeg" and got[6].img_width is None
    assert got[7].img_format == "jpeg" and got[7].img_width is None


def test_riff_avi_mux_demux_roundtrip():
    """build_avi → parse_avi_frames is exact for arbitrary frame
    payloads (odd lengths exercise RIFF even-padding)."""
    import pytest

    from etl_rj_spark.functions.riff import build_avi, is_riff_avi, parse_avi_frames

    frames = [b"x", b"frame-2", b"", b"odd\x00len7", b"\xff" * 100]
    avi = build_avi(frames)
    assert is_riff_avi(avi)
    assert parse_avi_frames(avi) == frames
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi_frames(b"MOOV not riff")


def test_sample_frames_demuxes_real_avi(spark):
    """AVI payloads take the real path: frame count and md5s come from
    the demuxed chunk payloads; a non-AVI payload in the same column
    gets one quarantine row with no frame data — the operator is total
    over mixed columns without inventing frames."""
    import hashlib

    from etl_rj_spark.functions.riff import build_avi

    frames_a = [b"a0", b"a1", b"a2", b"a3", b"a4"]
    frames_b = [b"b0"]
    rows = [
        (1, bytearray(build_avi(frames_a))),
        (2, bytearray(build_avi(frames_b))),
        (3, bytearray(b"not a video")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, every_n=2).collect()
    got = {(r.doc_id, r.frame_idx): r.frame_md5 for r in out}
    assert {(d, i) for d, i in got if d == 1} == {(1, 0), (1, 2), (1, 4)}
    assert got[(1, 2)] == hashlib.md5(b"a2").hexdigest()
    assert got[(2, 0)] == hashlib.md5(b"b0").hexdigest()
    quarantined = [r for r in out if r.doc_id == 3]
    assert len(quarantined) == 1
    assert quarantined[0].skip_reason == "not_riff_avi"
    assert quarantined[0].frame_idx is None and quarantined[0].frame_md5 is None
    assert all(r.skip_reason is None for r in out if r.doc_id != 3)


def test_jpeg_sof_walk_randomized_layouts(spark):
    """200 seeded-random JPEG segment layouts: APPn/COM/DQT runs of
    random sizes, optional fill bytes, every SOF variant, SOS-before-
    SOF, and over-cap layouts. Expected dims computed by construction
    (tracking the walk's step budget), so the expression walk is
    checked against an independent model — null when the layout is
    unresolvable, exact dims otherwise, never garbage."""
    import random
    import struct

    from etl_rj_spark.operators.multimodal import (
        _JPEG_MAX_SEGMENTS,
        parse_image_header,
    )

    rng = random.Random(42)
    sof_markers = [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
    seg_markers = [0xE0, 0xE1, 0xE2, 0xEC, 0xEE, 0xFE, 0xDB, 0xC4]  # APPn/COM/DQT/DHT
    rows, expected = [], {}
    for doc_id in range(200):
        b = b"\xff\xd8"
        steps = 0
        n_segs = rng.randrange(0, 22)
        for _ in range(n_segs):
            size = rng.randrange(0, 600)
            b += bytes([0xFF, rng.choice(seg_markers)]) + struct.pack(">H", size + 2) + bytes(size)
            steps += 1
            if rng.random() < 0.25:
                b += b"\xff"  # fill byte: costs one walk step
                steps += 1
        kind = rng.random()
        w, h = rng.randrange(1, 20000), rng.randrange(1, 20000)
        if kind < 0.7:  # SOF present
            b += bytes([0xFF, rng.choice(sof_markers)]) + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
            steps += 1  # the SOF-detecting iteration
            expected[doc_id] = (w, h) if steps <= _JPEG_MAX_SEGMENTS else (None, None)
        elif kind < 0.85:  # SOS before any SOF
            b += b"\xff\xda" + struct.pack(">H", 4) + b"\x00\x00"
            expected[doc_id] = (None, None)
        else:  # truncated right after the segments
            expected[doc_id] = (None, None)
        rows.append((doc_id, bytearray(b)))

    df = spark.createDataFrame(rows, "doc_id int, content binary")
    got = {r.doc_id: (r.img_width, r.img_height) for r in parse_image_header(df).collect()}
    assert all(parse_image_header(df).select("img_format").distinct().collect()[0])
    mismatches = {i: (got[i], expected[i]) for i in expected if got[i] != expected[i]}
    assert not mismatches, dict(list(mismatches.items())[:5])


def test_audio_stats_quarantines_null_and_truncated(spark):
    """Null payloads and structurally broken WAVs must produce
    quarantine rows, not task crashes (TypeError/struct.error escape
    regressions)."""
    import struct

    from etl_rj_spark.functions.riff import _chunk
    from etl_rj_spark.functions.wav import build_wav
    from etl_rj_spark.operators.multimodal import audio_stats

    # fmt chunk declares 16 bytes but the file is cut off inside it
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + _chunk(b"data", b"\x01\x00") + _chunk(b"fmt ", fmt)
    full = b"RIFF" + struct.pack("<I", len(body)) + body
    truncated_fmt = full[:-10]

    rows = audio_stats(
        spark.createDataFrame(
            [(1, build_wav([5, -5])), (2, None), (3, truncated_fmt)],
            "doc_id long, payload binary",
        )
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].skip_reason is None and by_id[1].n_samples == 2
    assert by_id[2].skip_reason == "not_riff_wave"
    assert by_id[3].skip_reason == "not_riff_wave"


def test_sample_frames_quarantines_null_and_empty_avi(spark):
    """Null payloads and structurally valid but frame-less AVIs must
    each emit exactly one quarantine row — neither a task crash
    (bytes(None)) nor a silent disappearance of the doc."""
    from etl_rj_spark.functions.riff import build_avi
    from etl_rj_spark.operators.multimodal import sample_frames

    rows = sample_frames(
        spark.createDataFrame(
            [(1, build_avi([b"f0", b"f1"])), (2, None), (3, build_avi([]))],
            "doc_id long, payload binary",
        ),
        every_n=1,
    ).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.doc_id, []).append(r)
    assert len(by_id[1]) == 2 and all(r.skip_reason is None for r in by_id[1])
    assert [r.skip_reason for r in by_id[2]] == ["null_payload"]
    assert [r.skip_reason for r in by_id[3]] == ["no_frames"]


def test_project_embeddings_null_vector_passes_through(spark):
    from etl_rj_spark.operators.similarity import project_embeddings

    df = spark.createDataFrame(
        [(1, [float(i) for i in range(8)]), (2, None)],
        "vec_id long, embedding array<double>",
    )
    out = project_embeddings(df, "embedding", in_dim=8, out_dim=2)
    got = {r.vec_id: r.proj for r in out.collect()}
    assert got[2] is None and got[1] is not None
