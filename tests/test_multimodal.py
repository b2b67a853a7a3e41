"""Multimodal tests: real BMP/PPM/WAV codec roundtrips, Arrow plumbing,
strict-mode boundaries for compressed formats."""

from __future__ import annotations

import numpy as np
import pytest

from moosestack_spark.ops.multimodal import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
    extract_audio_features,
    extract_image_features,
    gradient_pixels,
    make_fake_media,
    resize_images,
    sample_video_frames,
    sawtooth_samples,
)


def test_bmp_roundtrip_exact():
    px = gradient_pixels(7, 13, 5)  # odd width exercises row padding
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


def test_ppm_roundtrip_exact():
    px = gradient_pixels(3, 9, 4)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_wav_roundtrip_exact():
    s = sawtooth_samples(11, 128)
    out, rate = decode_wav_pcm16(encode_wav_pcm16(s, 22050))
    assert rate == 22050
    assert np.array_equal(out, s)


def test_decode_image_sniffs_format():
    px = gradient_pixels(1, 4, 4)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    assert np.array_equal(decode_image(encode_ppm(px)), px)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n....", strict=True)
    assert decode_image(b"\x89PNG\r\n\x1a\n....", strict=False) is None


def test_feature_extraction_matches_pixels(spark):
    media = make_fake_media(spark, 30)
    imgs = media.filter("meta.media_type = 'image'")
    feats = {r.media_id: r for r in extract_image_features(imgs).collect()}
    assert len(feats) == 10
    for mid, r in feats.items():
        px = gradient_pixels(mid, 8, 6).reshape(-1, 3).astype(np.int64)
        assert (r.width, r.height) == (8, 6)
        assert r.mean_r == float(px[:, 0].sum()) / 48
        assert r.mean_g == float(px[:, 1].sum()) / 48
        assert r.mean_b == float(px[:, 2].sum()) / 48


def test_audio_feature_extraction_matches_samples(spark):
    media = make_fake_media(spark, 30)
    auds = media.filter("meta.media_type = 'audio'")
    feats = {r.media_id: r for r in extract_audio_features(auds).collect()}
    assert len(feats) == 10
    for mid, r in feats.items():
        s = sawtooth_samples(mid, 64).astype(np.int64)
        assert r.sample_rate == 16000
        assert r.n_samples == 64
        assert r.mean_amp == float(s.sum()) / 64
        assert r.peak_amp == int(np.abs(s).max())


def test_strict_mode_raises_on_undecodable(spark):
    media = make_fake_media(spark, 30)
    vids = media.filter("meta.media_type = 'video'")  # digest payloads
    with pytest.raises(Exception):  # NotImplementedError inside the executor
        extract_image_features(vids, strict=True).collect()
    # non-strict: null features, ids preserved
    rows = extract_image_features(vids, strict=False).collect()
    assert len(rows) == 10
    assert all(r.width is None and r.mean_r is None for r in rows)


def test_resize_really_resizes(spark):
    media = make_fake_media(spark, 9).filter("meta.media_type = 'image'")
    out = resize_images(media, 4, 3)
    for r in out.collect():
        px = decode_bmp(bytes(r.payload))
        assert px.shape == (3, 4, 3)
        assert (r.meta.width, r.meta.height) == (4, 3)
        # nearest-neighbor: pixel (0,0) survives
        src = gradient_pixels(r.media_id, 8, 6)
        assert np.array_equal(px[0, 0], src[0, 0])


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


def test_feature_extraction_honors_id_col(spark):
    """Review r2: id_col must flow through to the output schema (was
    hardcoded to media_id, silently renaming the caller's id column)."""
    media = make_fake_media(spark, 12)
    imgs = media.filter("meta.media_type = 'image'").withColumnRenamed(
        "media_id", "doc_id"
    )
    feats = extract_image_features(imgs, id_col="doc_id")
    assert feats.schema.fieldNames()[0] == "doc_id"
    rows = feats.select("doc_id", "width").collect()
    assert len(rows) == 4 and all(r.width == 8 for r in rows)
    auds = media.filter("meta.media_type = 'audio'").withColumnRenamed(
        "media_id", "clip_id"
    )
    afeats = extract_audio_features(auds, id_col="clip_id")
    assert afeats.schema.fieldNames()[0] == "clip_id"
    assert afeats.select("clip_id").count() == 4


# --------------------------------------------------------------------------
# baseline JPEG codec (ops/jpeg.py)
# --------------------------------------------------------------------------


def test_jpeg_constant_tiles_roundtrip_exact():
    """8x8-constant-tile grayscale with a unit DC quant step roundtrips
    bit-exactly (DC-only blocks; the property the oracle-gated query
    relies on)."""
    import numpy as np

    from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(42)
    tiles = rng.integers(0, 256, (3, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg(img))
    assert dec.shape == (24, 40, 3)
    assert np.array_equal(dec[..., 0], img)
    assert np.array_equal(dec[..., 0], dec[..., 1])


def test_jpeg_general_roundtrip_bounded():
    """Arbitrary content through the full Huffman+DCT path stays within a
    small error bound at the near-lossless table, for grayscale, color and
    non-multiple-of-8 dimensions."""
    import numpy as np

    from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:29, 0:45]
    gray = ((x * 7 + y * 11) % 256).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(gray))[..., 0].astype(int)
    assert got.shape == (29, 45)
    assert np.abs(got - gray.astype(int)).max() <= 8

    rgb = np.stack(
        [(x * 2 + y) % 256, (x + y * 3) % 256, (x * 5 + y * 2) % 256], axis=-1
    ).astype(np.uint8)
    got3 = decode_jpeg(encode_jpeg(rgb)).astype(int)
    assert np.abs(got3 - rgb.astype(int)).max() <= 8  # YCbCr roundtrip loss


def test_jpeg_rejects_non_baseline():
    import numpy as np
    import pytest as _pytest

    from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_decode_image_sniffs_jpeg():
    import numpy as np

    from moosestack_spark.ops.jpeg import encode_jpeg
    from moosestack_spark.ops.multimodal import decode_image

    img = np.full((8, 16), 200, dtype=np.uint8)
    px = decode_image(encode_jpeg(img))
    assert px.shape == (8, 16, 3) and int(px[0, 0, 0]) == 200
