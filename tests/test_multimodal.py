"""Multimodal plumbing tests: schemas, Arrow batch shapes, UDF signatures,
cardinality — with the decode kernels stubbed (see ops/multimodal.py)."""

from __future__ import annotations

import pytest

from moosestack_spark.ops.multimodal import (
    extract_image_features,
    make_fake_media,
    resize_images,
    sample_video_frames,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = make_fake_media(spark, 32)
    feats = extract_image_features(media)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,features:array<double>,n_bytes:bigint>"
    )
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 32
    assert all(len(r.features) == 8 for r in rows.values())
    assert all(r.n_bytes == 128 for r in rows.values())
    # deterministic across runs
    again = {r.media_id: r.features for r in extract_image_features(media).collect()}
    assert again == {k: r.features for k, r in rows.items()}


def test_strict_mode_raises(spark):
    media = make_fake_media(spark, 2)
    with pytest.raises(Exception):  # NotImplementedError inside the executor
        extract_image_features(media, strict=True).collect()


def test_resize_updates_meta_only(spark):
    media = make_fake_media(spark, 6)
    out = resize_images(media, 224, 224)
    rows = out.collect()
    assert all(r.meta.width == 224 and r.meta.height == 224 for r in rows)
    # payload untouched
    orig = {r.media_id: r.payload for r in media.collect()}
    assert all(bytes(r.payload) == bytes(orig[r.media_id]) for r in rows)


def test_frame_sampling_cardinality(spark):
    media = make_fake_media(spark, 9)
    videos = media.filter("meta.media_type = 'video'")
    frames = sample_video_frames(videos, every_ms=500)
    per_video = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").count().withColumnRenamed("count", "n").collect()
    }
    durations = {r.media_id: r.meta.duration_ms for r in videos.collect()}
    for vid, n in per_video.items():
        expected = len(range(0, durations[vid], 500))
        assert n == expected
    assert frames.columns == ["media_id", "frame_ms", "frame_stub"]
