"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched Pandas UDFs
(``mapInPandas``).

The Spark-side plumbing — schema, batch iteration, partitioning — is
real and tested. The actual media decode is STUBBED: the container has
no image/audio libraries, so ``decode_image`` raises
``NotImplementedError`` unless PIL is importable, and
``binary_features`` computes deterministic byte-level features
(length, md5, fake dimensions derived from the hash) that stand in for
a decode step while exercising the exact same execution path a real
decoder would use.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
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
            md5s = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": md5s,
                    "fake_width": md5s.map(lambda h: _fake_dims(h)[0]).astype("int32"),
                    "fake_height": md5s.map(lambda h: _fake_dims(h)[1]).astype("int32"),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Decode image payloads to (width, height, mode). Requires PIL —
    STUB in this container (SURVEY north-star multimodal note)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; not available in this container — "
            "use binary_features for the deterministic stand-in path"
        )
    raise NotImplementedError("real decode path: wire PIL.Image.open per payload here")


def _fake_dims(md5hex: str) -> tuple[int, int]:
    """Deterministic decode stand-in: 'image dimensions' derived from
    the content hash (1..512 each)."""
    return 1 + int(md5hex[:2], 16) % 512, 1 + int(md5hex[2:4], 16) % 512


RESIZE_SCHEMA = "doc_id long, width int, height int, out_width int, out_height int, resized_md5 string"


def resize_images(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving downscale to ``max_side`` via mapInPandas.
    The decode is the stubbed stand-in (_fake_dims of the content
    hash); the scaling arithmetic, fixed output schema, and Arrow batch
    path are exactly what a PIL-backed resize would use — swap the two
    marked lines for `Image.open`/`img.resize` when the codec library
    exists."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            md5s = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims = md5s.map(_fake_dims)  # STUB: real path decodes the payload here
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            scale = (max_side / pd.concat([w, h], axis=1).max(axis=1)).clip(upper=1.0)
            ow = (w * scale).round().clip(lower=1).astype("int32")
            oh = (h * scale).round().clip(lower=1).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_width": ow,
                    "out_height": oh,
                    # STUB: real path re-encodes pixels; hash stands in
                    "resized_md5": [
                        hashlib.md5(f"{m}:{a}x{b}".encode()).hexdigest()
                        for m, a, b in zip(md5s, ow, oh)
                    ],
                }
            )

    return df.mapInPandas(op, schema=RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one OUTPUT ROW per sampled frame
    (row-expanding mapInPandas — the batch shape real frame extraction
    needs). Fake frame count = 1 + hash-derived (1..64); frame content
    hash = md5(content_md5:frame_idx). Swap the marked lines for a real
    demuxer when the codec library exists."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fmd5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = hashlib.md5(bytes(payload)).hexdigest()
                n_frames = 1 + int(m[4:6], 16) % 64  # STUB: real path probes the container
                for i in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(i)
                    # STUB: real path decodes frame i; hash stands in
                    fmd5.append(hashlib.md5(f"{m}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(fmd5, dtype="object"),
                }
            )

    return df.mapInPandas(op, schema=FRAMES_SCHEMA)


def parse_image_header(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Native-expression image-header sniffing: format, width, height
    parsed from the first bytes of an opaque ``binary`` column — PNG
    (IHDR big-endian dims at offsets 17/21) and GIF (little-endian
    dims at 7/9) — entirely with built-in byte/conv functions, no
    Python and no imaging library. Unknown magic → nulls (rows keep
    flowing; a quarantine rule can catch them downstream).

    This is the cheap metadata pass a multimodal pipeline runs BEFORE
    deciding what to decode: filtering 100 TB of images by dimensions
    must not decode pixels. JPEG dims live in variable-position SOF
    markers — that genuinely needs the (gated) decoder path, so JPEG
    reports format only.
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
    width = (
        F.when(fmt == "png", be32(17))
        .when(fmt == "gif", le16(7))
        .otherwise(F.lit(None).cast("long"))
    )
    height = (
        F.when(fmt == "png", be32(21))
        .when(fmt == "gif", le16(9))
        .otherwise(F.lit(None).cast("long"))
    )
    return df.withColumns(
        {"img_format": fmt, "img_width": width, "img_height": height}
    )
