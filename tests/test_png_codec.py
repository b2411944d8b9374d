"""The dependency-free PNG codec (functions/png.py) and the real
decode/resize paths it unlocks in operators/multimodal.py."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pytest

from etl_rj_spark.functions.png import (
    SIGNATURE,
    decode_png,
    encode_png,
    resize_nearest,
)


def _gradient(h, w, channels=None, seed=7):
    i = np.arange(h).reshape(h, 1)
    j = np.arange(w).reshape(1, w)
    base = (seed * 31 + i * 7 + j) % 256
    if channels is None:
        return base.astype(np.uint8)
    return np.stack([(base + 13 * c) % 256 for c in range(channels)], axis=2).astype(
        np.uint8
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (7, 23)])
def test_gray_roundtrip_all_filters(filter_type, shape):
    arr = _gradient(*shape)
    out, mode = decode_png(encode_png(arr, filter_type=filter_type))
    assert mode == "L" and (out == arr).all()


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels,mode", [(3, "RGB"), (4, "RGBA")])
def test_color_roundtrip_all_filters(filter_type, channels, mode):
    arr = _gradient(9, 11, channels)
    out, got_mode = decode_png(encode_png(arr, filter_type=filter_type))
    assert got_mode == mode and (out == arr).all()


def test_palette_decode_expands_to_rgb():
    """Hand-built color-type-3 PNG: palette indices expand through PLTE."""
    w, h = 4, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B
    idx = np.array([[0, 1, 2, 0], [2, 2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))

    def chunk(tag, data):
        import binascii

        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
        )

    png = (
        SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out, mode = decode_png(png)
    assert mode == "RGB" and out.shape == (2, 4, 3)
    assert tuple(out[0, 0]) == (255, 0, 0) and tuple(out[1, 2]) == (0, 255, 0)


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"definitely not a png")
    # 16-bit depth header
    import binascii

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
        )

    deep = (
        SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(deep)


def test_resize_nearest_dims_and_determinism():
    arr = _gradient(64, 48, 3)
    out = resize_nearest(arr, 24, 32)
    assert out.shape == (32, 24, 3)
    assert (out == resize_nearest(arr, 24, 32)).all()
    assert (resize_nearest(arr, 48, 64) == arr).all()  # identity at same dims


def test_decode_image_operator_real_png(spark):
    """decode_image over a mixed batch: real PNGs decode (width/height/
    mode/pixel_sum), non-image payloads yield nulls."""
    from etl_rj_spark.operators.multimodal import decode_image

    a = _gradient(5, 9)
    b = _gradient(6, 4, 3, seed=3)
    rows = [
        (1, bytearray(encode_png(a, filter_type=4))),
        (2, bytearray(encode_png(b, filter_type=2))),
        (3, bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_image(df).collect()}
    assert (got[1].width, got[1].height, got[1].mode) == (9, 5, "L")
    assert got[1].pixel_sum == int(a.astype("int64").sum())
    assert got[1].pixel_md5 == hashlib.md5(a.tobytes()).hexdigest()
    assert (got[2].width, got[2].height, got[2].mode) == (4, 6, "RGB")
    assert got[2].pixel_sum == int(b.astype("int64").sum())
    assert got[3].width is None and got[3].pixel_md5 is None


def test_resize_images_operator_real_png(spark):
    """resize_images takes the real path for PNG payloads: output dims
    honor max_side and resized_md5 is the md5 of a re-encoded PNG that
    itself decodes to the expected downsampled pixels."""
    from etl_rj_spark.operators.multimodal import resize_images

    arr = _gradient(64, 32)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(arr)))], "doc_id long, payload binary"
    )
    [r] = resize_images(df, max_side=16).collect()
    assert (r.width, r.height) == (32, 64)
    assert (r.out_width, r.out_height) == (8, 16)
    expected = encode_png(resize_nearest(arr, 8, 16))
    assert r.resized_md5 == hashlib.md5(expected).hexdigest()


# --- property tests (hypothesis) -------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    channels=st.sampled_from([None, 3, 4]),
    filter_type=st.integers(0, 4),
    seed=st.integers(0, 10_000),
)
def test_property_roundtrip_any_shape_filter(h, w, channels, filter_type, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels is None else (h, w, channels)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out, _ = decode_png(encode_png(arr, filter_type=filter_type))
    assert (out == arr).all()


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    oh=st.integers(1, 40),
    ow=st.integers(1, 40),
)
def test_property_resize_dims_and_value_membership(h, w, oh, ow):
    rng = np.random.default_rng(h * 1000 + w * 100 + oh * 10 + ow)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = resize_nearest(arr, ow, oh)
    assert out.shape == (oh, ow)
    # nearest-neighbor never invents pixel values
    assert set(np.unique(out)) <= set(np.unique(arr))
