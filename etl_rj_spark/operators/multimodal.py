"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
(``mapInPandas``).

The Spark-side plumbing — schema, batch iteration, partitioning — is
real and tested. Image decode is REAL for PNG via the dependency-free
codec in :mod:`etl_rj_spark.functions.png` (PIL is used instead when
importable, which also unlocks JPEG); payloads in formats with no
available codec yield null decode columns so rows keep flowing and a
quarantine rule can catch them. Video frame sampling is REAL for
RIFF/AVI containers via the dependency-free demuxer in
:mod:`etl_rj_spark.functions.riff` (frame-chunk payload hashing — no
pixel codec needed); a non-AVI payload yields a single quarantine row
(``skip_reason``), never fabricated frames. Audio is REAL for RIFF/WAVE PCM16 via
:mod:`etl_rj_spark.functions.wav` (``audio_stats``: exact integer
energy/peak/sample-count, same quarantine posture).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - PIL absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

#: Output schema of binary_features — fixed, so downstream plans are
#: stable regardless of batch contents.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, fake_width int, fake_height int"
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text column as an opaque binary payload + typed metadata
    struct — the canonical multimodal column shape."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("payload"), meta.alias("meta"))


def binary_features(df: DataFrame) -> DataFrame:
    """Per-payload features via mapInPandas (Arrow batches, vectorized
    pandas inside). This is the plumbing a real image decode would use;
    the 'dimensions' here are deterministic functions of the content
    hash (a decode stand-in, verifiable by any engine with md5)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # na_action="ignore" + nullable Int dtypes: a NULL payload
            # (absent blob) yields NULL features, never a worker crash
            # — quarantine semantics, matching the oracle's
            # md5(NULL) → NULL (r10 nullmix degenerate-regime fix)
            md5s = payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest(), na_action="ignore"
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len, na_action="ignore").astype("Int64"),
                    "content_md5": md5s,
                    "fake_width": md5s.map(
                        lambda h: _fake_dims(h)[0], na_action="ignore"
                    ).astype("Int32"),
                    "fake_height": md5s.map(
                        lambda h: _fake_dims(h)[1], na_action="ignore"
                    ).astype("Int32"),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


DECODE_SCHEMA = (
    "doc_id long, width int, height int, mode string, pixel_md5 string, pixel_sum long"
)


def _decode_payload(b: bytes):
    """Decode one image payload → (width, height, mode, pixel_md5,
    pixel_sum) or all-None when no available codec handles the bytes.
    ``pixel_sum`` (total brightness) is the cheap QC statistic a
    training-data filter thresholds on — and, being pure integer
    arithmetic over the decoded pixels, it is what the SQL oracle
    recomputes to prove the decode is real."""
    try:
        if _HAS_PIL:  # pragma: no cover - PIL absent in this container
            import io

            import numpy as np

            img = Image.open(io.BytesIO(b))
            arr = np.asarray(img)
            return (
                img.width,
                img.height,
                img.mode,
                hashlib.md5(arr.tobytes()).hexdigest(),
                int(arr.astype("int64").sum()),
            )
        from etl_rj_spark.functions.png import decode_png

        arr, mode = decode_png(b)
        h, w = arr.shape[:2]
        return (
            w,
            h,
            mode,
            hashlib.md5(arr.tobytes()).hexdigest(),
            int(arr.astype("int64").sum()),
        )
    except (ValueError, OSError):
        return None, None, None, None, None


def decode_image(df: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height, mode, md5-of-pixels)
    via mapInPandas. PNG decodes with the stdlib+numpy codec
    (functions/png.py); PIL, when importable, widens the codec set
    (JPEG etc.). Undecodable payloads yield nulls — rows keep flowing
    so a quarantine rule can catch them downstream."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_payload(bytes(b)) for b in pdf["payload"]]
            w, h, mode, pmd5, psum = zip(*decoded) if decoded else ((), (), (), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "mode": pd.Series(mode, dtype="object"),
                    "pixel_md5": pd.Series(pmd5, dtype="object"),
                    "pixel_sum": pd.array(psum, dtype="Int64"),
                }
            )

    return df.mapInPandas(op, schema=DECODE_SCHEMA)


def _fake_dims(md5hex: str) -> tuple[int, int]:
    """Deterministic decode stand-in: 'image dimensions' derived from
    the content hash (1..512 each)."""
    return 1 + int(md5hex[:2], 16) % 512, 1 + int(md5hex[2:4], 16) % 512


RESIZE_SCHEMA = "doc_id long, width int, height int, out_width int, out_height int, resized_md5 string"


def _out_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    scale = min(1.0, max_side / max(w, h))
    return max(1, round(w * scale)), max(1, round(h * scale))


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving downscale to ``max_side`` via mapInPandas.
    Payloads that decode (PNG via functions/png.py, more with PIL) take
    the REAL path: decode → nearest-neighbor resample → re-encode PNG,
    ``resized_md5`` = md5 of the re-encoded bytes. Undecodable payloads
    keep the deterministic hash-derived stand-in (same schema), so the
    operator is total over mixed binary columns."""
    from etl_rj_spark.functions.png import decode_png, encode_png, resize_nearest

    def one(b: bytes) -> tuple[int, int, int, int, str]:
        m = hashlib.md5(b).hexdigest()
        try:
            arr, _mode = decode_png(b)
        except ValueError:
            w, h = _fake_dims(m)  # stand-in for undecodable payloads
            ow, oh = _out_dims(w, h, max_side)
            return w, h, ow, oh, hashlib.md5(f"{m}:{ow}x{oh}".encode()).hexdigest()
        h, w = arr.shape[:2]
        ow, oh = _out_dims(w, h, max_side)
        resized = encode_png(resize_nearest(arr, ow, oh))
        return w, h, ow, oh, hashlib.md5(resized).hexdigest()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [one(bytes(b)) for b in pdf["payload"]]
            w, h, ow, oh, md5s = zip(*rows) if rows else ((), (), (), (), ())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pd.array(w, dtype="int32"),
                    "height": pd.array(h, dtype="int32"),
                    "out_width": pd.array(ow, dtype="int32"),
                    "out_height": pd.array(oh, dtype="int32"),
                    "resized_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return df.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_md5 string, skip_reason string"


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one OUTPUT ROW per sampled frame
    (row-expanding mapInPandas — the batch shape frame extraction
    needs). RIFF/AVI payloads take the REAL path: the container is
    demuxed (functions/riff.py), the frame count is the container's,
    and ``frame_md5`` is the md5 of each sampled frame's raw chunk
    payload — the per-frame dedup/QC hash a training pipeline computes.

    A payload that is NOT a demuxable container yields ZERO frame rows
    and exactly one quarantine row (null frame_idx/frame_md5,
    ``skip_reason='not_riff_avi'``) — the engine never invents frames
    for bytes it can't demux. Same posture as decode_image's
    unknown-format nulls and the JSONL corrupt-record quarantine:
    every input doc stays visible downstream, nothing is fabricated.
    """
    from etl_rj_spark.functions.riff import is_riff_avi, parse_avi_frames

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fmd5, reason = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                def skip(why: str) -> None:
                    ids.append(doc_id)
                    idxs.append(None)
                    fmd5.append(None)
                    reason.append(why)

                if payload is None:  # bytes(None) would kill the task
                    skip("null_payload")
                    continue
                b = bytes(payload)
                if not is_riff_avi(b):
                    skip("not_riff_avi")
                    continue
                frames = parse_avi_frames(b)
                if not frames:  # valid but frame-less container: the
                    skip("no_frames")  # doc must stay visible downstream
                    continue
                for i in range(0, len(frames), every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    fmd5.append(hashlib.md5(frames[i]).hexdigest())
                    reason.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="Int32"),
                    "frame_md5": pd.Series(fmd5, dtype="object"),
                    "skip_reason": pd.Series(reason, dtype="object"),
                }
            )

    return df.mapInPandas(op, schema=FRAMES_SCHEMA)


#: JPEG frame (SOF) markers that carry dimensions — every 0xCn except
#: C4 (DHT), C8 (JPG reserved), CC (DAC).
_JPEG_SOF_MARKERS = [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]

#: Segments to walk before giving up on finding a SOF. Real JPEGs put
#: SOF within the first handful of segments (APPn, COM, DQT, DHT);
#: the cap bounds the unrolled expression, not the bytes skipped —
#: length-prefixed segments (e.g. a 64 KB EXIF APP1) are jumped over
#: in one step.
_JPEG_MAX_SEGMENTS = 16


def _jpeg_sof_dims(c: Column) -> tuple[Column, Column]:
    """(width, height) from a JPEG's SOF marker — a bounded marker walk
    as a single JVM-side expression (``aggregate`` over a constant
    sequence; each step is O(1) struct arithmetic). SOF position varies
    per file, so the walk follows the segment length chain from SOI;
    nulls when no SOF surfaces within the cap (or the chain breaks).
    No Python, no decode — exactly what a filter-by-dims pass over
    100 TB of images needs."""

    def u8(pos: Column) -> Column:
        return F.conv(F.hex(c.substr(pos.cast("int"), F.lit(1))), 16, 10).cast("long")

    def be16(pos: Column) -> Column:
        return F.conv(F.hex(c.substr(pos.cast("int"), F.lit(2))), 16, 10).cast("long")

    nil = F.lit(None).cast("long")

    def step(st: Column, _i: Column) -> Column:
        off = st["off"]
        m0, m1 = u8(off), u8(off + 1)
        live = (
            st["w"].isNull()
            & (off > 0)
            & (off + 1 <= F.octet_length(c))
            & (m0 == 0xFF)
        )
        is_sof = m1.isin(_JPEG_SOF_MARKERS)
        halt = m1 == 0xDA  # SOS: entropy-coded data follows, no SOF seen
        next_off = (
            F.when(m1 == 0xFF, off + 1)  # fill byte before a marker
            .when(is_sof | halt, F.lit(-1).cast("long"))
            .otherwise(off + 2 + be16(off + 2))
        )
        return F.when(
            live,
            F.struct(
                next_off.alias("off"),
                F.when(is_sof, be16(off + 7)).otherwise(nil).alias("w"),
                F.when(is_sof, be16(off + 5)).otherwise(nil).alias("h"),
            ),
        ).otherwise(st)

    init = F.struct(
        F.lit(3).cast("long").alias("off"),  # 1-based: first marker after SOI
        nil.alias("w"),
        nil.alias("h"),
    )
    walked = F.aggregate(
        F.sequence(F.lit(1), F.lit(_JPEG_MAX_SEGMENTS)), init, step
    )
    return walked["w"], walked["h"]


def parse_image_header(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Native-expression image-header sniffing: format, width, height
    parsed from the bytes of an opaque ``binary`` column — PNG (IHDR
    big-endian dims at offsets 17/21), GIF (little-endian dims at 7/9),
    and JPEG (bounded SOF marker walk, see ``_jpeg_sof_dims``) —
    entirely with built-in byte/conv expressions, no Python and no
    imaging library. Unknown magic → nulls (rows keep flowing; a
    quarantine rule can catch them downstream).

    This is the cheap metadata pass a multimodal pipeline runs BEFORE
    deciding what to decode: filtering 100 TB of images by dimensions
    must not decode pixels.
    """
    c = F.col(content_col)

    def be32(offset: int):  # 4-byte big-endian uint at 1-based offset
        return F.conv(F.hex(F.substring(c, offset, 4)), 16, 10).cast("long")

    def le16(offset: int):  # 2-byte little-endian uint16 at 1-based offset
        lo = F.conv(F.hex(F.substring(c, offset, 1)), 16, 10).cast("long")
        hi = F.conv(F.hex(F.substring(c, offset + 1, 1)), 16, 10).cast("long")
        return lo + hi * 256

    magic4 = F.hex(F.substring(c, 1, 4))
    fmt = (
        F.when(magic4 == "89504E47", F.lit("png"))
        .when(F.substring(c, 1, 3).cast("string") == "GIF", F.lit("gif"))
        .when(F.hex(F.substring(c, 1, 2)) == "FFD8", F.lit("jpeg"))
        .otherwise(F.lit(None).cast("string"))
    )
    jw, jh = _jpeg_sof_dims(c)
    width = (
        F.when(fmt == "png", be32(17))
        .when(fmt == "gif", le16(7))
        .when(fmt == "jpeg", jw)
        .otherwise(F.lit(None).cast("long"))
    )
    height = (
        F.when(fmt == "png", be32(21))
        .when(fmt == "gif", le16(9))
        .when(fmt == "jpeg", jh)
        .otherwise(F.lit(None).cast("long"))
    )
    return df.withColumns(
        {"img_format": fmt, "img_width": width, "img_height": height}
    )


AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, energy long, "
    "peak_abs int, skip_reason string"
)


def audio_stats(df: DataFrame) -> DataFrame:
    """Audio QC statistics over a binary column of WAV payloads — the
    audio twin of ``sample_frames``: RIFF/WAVE PCM16 payloads take the
    REAL path (demuxed by functions/wav.py; per-payload sample count,
    exact integer energy = Σ s², peak |s|), and a payload that is NOT
    a parsable PCM16 WAV yields one quarantine row with null stats and
    ``skip_reason='not_riff_wave'`` — nothing fabricated, every input
    doc stays visible downstream.

    Integer energy instead of float RMS keeps the statistic exact and
    engine-independent (the DuckDB oracle recomputes it analytically);
    RMS is ``sqrt(energy / n_samples)`` for whoever wants the float.
    Σ s² fits int64 up to ~2³³ samples per payload (≈ 27 h at 44.1 kHz
    stereo) — beyond that the Arrow Int64 cast raises rather than
    silently wrapping.
    """
    from etl_rj_spark.functions.wav import parse_wav

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rates, ns, energy, peak, reason = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    rate, _channels, samples = parse_wav(bytes(payload))
                    rates.append(rate)
                    ns.append(len(samples))
                    energy.append(sum(s * s for s in samples))
                    peak.append(max((abs(s) for s in samples), default=0))
                    reason.append(None)
                except ValueError:
                    rates.append(None)
                    ns.append(None)
                    energy.append(None)
                    peak.append(None)
                    reason.append("not_riff_wave")
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(ns, dtype="Int32"),
                    "energy": pd.array(energy, dtype="Int64"),
                    "peak_abs": pd.array(peak, dtype="Int32"),
                    "skip_reason": pd.Series(reason, dtype="object"),
                }
            )

    return df.mapInPandas(op, schema=AUDIO_SCHEMA)
