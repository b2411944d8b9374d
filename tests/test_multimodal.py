"""Multimodal plumbing: binary payload shape, Arrow-batched feature
extraction, aspect-preserving resize, and row-expanding frame sampling
— deterministic decode stand-ins, real execution paths."""

from __future__ import annotations

import math

from etl_rj_spark.operators.multimodal import (
    binary_features,
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


def test_sample_frames_expansion_count(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    feats = {r.doc_id: r.content_md5 for r in binary_features(p).collect()}
    got = sample_frames(p, every_n=10).collect()
    expected_rows = sum(
        math.ceil((1 + int(m[4:6], 16) % 64) / 10) for m in feats.values()
    )
    assert len(got) == expected_rows
    assert all(r.frame_idx % 10 == 0 for r in got)


def test_multimodal_partitioning_invariance(spark, sf_dir):
    p = _payloads(spark, sf_dir)
    one = {(r.doc_id, r.frame_idx, r.frame_md5) for r in sample_frames(p).collect()}
    many = {
        (r.doc_id, r.frame_idx, r.frame_md5)
        for r in sample_frames(p.repartition(7)).collect()
    }
    assert one == many and len(one) > 0
