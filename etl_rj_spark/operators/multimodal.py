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
                    "fake_width": md5s.map(lambda h: 1 + int(h[:2], 16) % 512).astype("int32"),
                    "fake_height": md5s.map(lambda h: 1 + int(h[2:4], 16) % 512).astype("int32"),
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
