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
    # TIFF decodes for real now (ops/tiff.py)
    from moosestack_spark.ops.tiff import encode_tiff

    tf = encode_tiff(px, "packbits")
    assert np.array_equal(decode_image(tf), px)
    # WebP VP8L decodes for real now (ops/webp.py)
    from moosestack_spark.ops.webp import encode_webp_lossless

    wp = encode_webp_lossless(px, transform="subtract_green")
    assert np.array_equal(decode_image(wp), px)
    # chunkless WEBP container = corrupt known format: strict raises
    with pytest.raises(Exception):
        decode_image(b"RIFFxxxxWEBP", strict=True)
    assert decode_image(b"RIFFxxxxWEBP", strict=False) is None
    # corrupt TIFF: strict raises, non-strict nulls
    with pytest.raises(Exception):
        decode_image(b"II*\x00....", strict=True)
    assert decode_image(b"II*\x00....", strict=False) is None
    # corrupt payload of a KNOWN format: raises under strict, None otherwise
    for junk in (b"\x89PNG\r\n\x1a\n....", b"GIF89a...."):
        with pytest.raises(Exception):
            decode_image(junk, strict=True)
        assert decode_image(junk, strict=False) is None


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


def test_jpeg_rejects_non_dct_frames():
    import numpy as np
    import pytest as _pytest

    from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless): unsupported
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_jpeg_progressive_matches_baseline_decode():
    """Progressive (SOF2) pipeline: decoded output must be byte-identical
    to the baseline pipeline for the same pixels and quant table — the
    two entropy layers share only the DCT front end, so agreement
    cross-validates DC first/refine, AC spectral selection with EOB runs,
    and AC successive-approximation refinement."""
    import numpy as np

    from moosestack_spark.ops.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    tiles = rng.integers(0, 256, (3, 5), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img))[..., 0], img
    )  # unit-DC constant tiles stay exact through the progressive path

    y, x = np.mgrid[0:29, 0:45]
    gray = ((x * 7 + y * 11) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(gray)), decode_jpeg(encode_jpeg_progressive(gray))
    )
    rgb = np.stack(
        [(x * 2 + y) % 256, (x + y * 3) % 256, (x * 5 + y * 2) % 256], axis=-1
    ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(rgb)), decode_jpeg(encode_jpeg_progressive(rgb))
    )
    for trial in range(3):
        im = rng.integers(0, 256, (17 + trial * 3, 23 + trial * 5), np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(im)),
            decode_jpeg(encode_jpeg_progressive(im)),
        ), trial


def test_decode_image_sniffs_jpeg():
    import numpy as np

    from moosestack_spark.ops.jpeg import encode_jpeg
    from moosestack_spark.ops.multimodal import decode_image

    img = np.full((8, 16), 200, dtype=np.uint8)
    px = decode_image(encode_jpeg(img))
    assert px.shape == (8, 16, 3) and int(px[0, 0, 0]) == 200


# --------------------------------------------------------------------------
# PNG codec (ops/png.py)
# --------------------------------------------------------------------------


def test_png_lossless_roundtrip():
    import numpy as np

    from moosestack_spark.ops.png import decode_png, encode_png

    y, x = np.mgrid[0:23, 0:37]
    gray = ((x * 7 + y * 11) % 256).astype(np.uint8)
    got = decode_png(encode_png(gray))
    assert got.shape == (23, 37, 3)
    assert np.array_equal(got[..., 0], gray)

    rgb = np.stack(
        [(x * 2 + y) % 256, (x + y * 3) % 256, (x * 5) % 256], axis=-1
    ).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def test_png_all_filters_and_exotic_layouts():
    """Decode PNGs built by hand with every scanline filter, a palette,
    RGBA-over-white compositing and 16-bit samples — paths the encoder
    itself never emits."""
    import struct
    import zlib

    import numpy as np

    from moosestack_spark.ops.png import PNG_MAGIC, _chunk, decode_png

    h, w, bpp = 5, 8, 3
    px = ((np.arange(h)[:, None] * 13 + np.arange(w * 3)[None, :] * 7) % 256).astype(
        np.uint8
    )
    scan = bytearray()
    prev = np.zeros(w * 3, np.int64)
    for yy in range(h):
        f = yy % 5
        line = px[yy].astype(np.int64)
        enc = np.zeros(w * 3, np.int64)
        for xx in range(w * 3):
            a = line[xx - bpp] if xx >= bpp else 0
            b = prev[xx]
            c = prev[xx - bpp] if xx >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[xx] = (line[xx] - pred) & 0xFF
        scan.append(f)
        scan += bytes(enc.astype(np.uint8))
        prev = line
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), px.reshape(h, w, 3))

    # palette
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8)
    idx = (np.arange(h)[:, None] + np.arange(w)[None, :]) % 4
    scan2 = bytearray()
    for yy in range(h):
        scan2.append(0)
        scan2 += bytes(idx[yy].astype(np.uint8))
    data2 = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(bytes(scan2)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data2), pal[idx])

    # RGBA composited over white: (100*128 + 255*127 + 127)//255 == 177
    rgba = np.zeros((2, 2, 4), np.uint8)
    rgba[..., :3] = 100
    rgba[..., 3] = 128
    scan3 = bytearray()
    for yy in range(2):
        scan3.append(0)
        scan3 += bytes(rgba[yy].reshape(-1))
    data3 = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(scan3)))
        + _chunk(b"IEND", b"")
    )
    assert int(decode_png(data3)[0, 0, 0]) == 177

    # 16-bit grayscale scales to the high byte
    g16 = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 5000)
    scan4 = bytearray()
    for yy in range(3):
        scan4.append(0)
        scan4 += g16[yy].astype(">u2").tobytes()
    data4 = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(scan4)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data4)[..., 0], (g16 >> 8).astype(np.uint8))


def test_png_adam7_manual_fixture_decodes():
    """Hand-framed 2x2 Adam7 stream: pass 1 holds (0,0), pass 6 holds
    (1,0), pass 7 holds row 1 — the decoder reassembles [[a,b],[c,d]]."""
    import struct
    import zlib

    import numpy as np

    from moosestack_spark.ops.png import PNG_MAGIC, _chunk, decode_png

    a, b, c, d = 10, 20, 30, 40
    payload = bytes([0, a]) + bytes([0, b]) + bytes([0, c, d])
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(payload))
        + _chunk(b"IEND", b"")
    )
    px = decode_png(data)
    expect = np.repeat(np.array([[a, b], [c, d]], np.uint8)[..., None], 3, axis=2)
    assert np.array_equal(px, expect)


def test_decode_image_sniffs_png():
    import numpy as np

    from moosestack_spark.ops.multimodal import decode_image
    from moosestack_spark.ops.png import encode_png

    img = np.full((8, 16), 123, dtype=np.uint8)
    px = decode_image(encode_png(img))
    assert px.shape == (8, 16, 3) and int(px[0, 0, 0]) == 123


def test_mp4_metadata_parse():
    import struct

    import pytest as _pytest

    from moosestack_spark.ops.multimodal import (
        encode_minimal_mp4,
        parse_mp4_metadata,
    )

    for dur, w, h in ((2000, 320, 240), (987654, 1920, 1080), (1, 16, 9)):
        meta = parse_mp4_metadata(encode_minimal_mp4(dur, w, h))
        assert meta == {
            "duration_ms": dur, "width": w, "height": h, "n_tracks": 1
        }

    with _pytest.raises(ValueError):
        parse_mp4_metadata(b"\x00" * 20)

    # mvhd v1 (64-bit times) — a layout the planting encoder never emits
    def box(t, p):
        return struct.pack(">I", 8 + len(p)) + t + p

    ts, dur = 90000, 12345678901
    mvhd1 = box(b"mvhd", struct.pack(">B3xQQIQ", 1, 0, 0, ts, dur) + b"\x00" * 80)
    data = box(b"ftyp", b"isom" + struct.pack(">I", 512)) + box(b"moov", mvhd1)
    assert parse_mp4_metadata(data)["duration_ms"] == dur * 1000 // ts


def test_g711_decode_known_values():
    """mu-law/A-law expansion pinned to ITU-T reference points and
    roundtripped through the RIFF container."""
    import numpy as np

    from moosestack_spark.ops.multimodal import (
        _ALAW,
        _MULAW,
        decode_wav,
        encode_wav_g711,
    )

    # canonical expansion points (Sun g711.c reference table scale):
    assert int(_MULAW[0xFF]) == 0          # quietest positive
    assert int(_MULAW[0x7F]) == 0          # quietest negative (-0)
    assert int(_MULAW[0x00]) == -32124     # loudest negative
    assert int(_MULAW[0x80]) == 32124      # loudest positive
    assert int(_ALAW[0x55]) == -8          # A-law quietest negative
    assert int(_ALAW[0xD5]) == 8           # A-law quietest positive
    assert int(_ALAW[0xAA]) == 32256       # A-law loudest positive
    assert int(_ALAW[0x2A]) == -32256      # A-law loudest negative

    raw = np.arange(256, dtype=np.uint8)
    s_mu, rate = decode_wav(encode_wav_g711(raw, 8000, "mulaw"))
    assert rate == 8000 and np.array_equal(s_mu, _MULAW[raw])
    s_a, _ = decode_wav(encode_wav_g711(raw, 8000, "alaw"))
    assert np.array_equal(s_a, _ALAW[raw])

    # PCM16 path unchanged through the general decoder
    from moosestack_spark.ops.multimodal import encode_wav_pcm16

    pcm = encode_wav_pcm16(np.array([0, 100, -100], dtype=np.int16), 16000)
    s, r = decode_wav(pcm)
    assert r == 16000 and list(s) == [0, 100, -100]


# --------------------------------------------------------------------------
# GIF codec (ops/gif.py)
# --------------------------------------------------------------------------


def _lzw_compress_real(indices, min_code_size):
    """Spec-faithful GIF LZW compressor with table growth — exercises the
    decoder's dynamic-table path, which the clear-per-pixel planting
    encoder deliberately avoids."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, size):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, code_size)
    prev = b""
    for v in indices:
        cur = prev + bytes([int(v)])
        if cur in table:
            prev = cur
            continue
        emit(table[prev], code_size)
        table[cur] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        prev = bytes([int(v)])
    if prev:
        emit(table[prev], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(w, h, ct, stream, min_code_size, interlaced=False):
    import struct as _s

    depth = max(2, (len(ct) - 1).bit_length())
    full = np.zeros((1 << depth, 3), np.uint8)
    full[: len(ct)] = ct
    out = bytearray(b"GIF89a")
    out += _s.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += full.tobytes()
    out += b"\x2c" + _s.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
    out += bytes([min_code_size])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_real_lzw_with_table_growth():
    from moosestack_spark.ops.gif import decode_gif

    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    # repetitive content so LZW actually builds long table entries
    idx = (np.arange(40 * 30).reshape(30, 40) // 7 % 16).astype(np.int32)
    stream = _lzw_compress_real(idx.reshape(-1), 4)
    data = _wrap_gif(40, 30, pal, stream, 4)
    assert np.array_equal(decode_gif(data), pal[idx])


def test_gif_interlaced():
    from moosestack_spark.ops.gif import decode_gif

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    h, w = 11, 6
    idx = ((np.arange(h)[:, None] + np.arange(w)[None, :]) % 4).astype(np.int32)
    # interlace: rows stored in 4-pass order
    order = np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    )
    stored = idx[order]
    stream = _lzw_compress_real(stored.reshape(-1), 2)
    data = _wrap_gif(w, h, pal, stream, 2, interlaced=True)
    assert np.array_equal(decode_gif(data), pal[idx])


def test_gif_transparency_composites_white():
    from moosestack_spark.ops.gif import decode_gif, encode_gif

    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    idx = np.array([[0, 1], [1, 0]], np.int32)
    data = bytearray(encode_gif(idx, pal))
    # inject a graphic-control extension marking index 0 transparent,
    # right before the image descriptor
    desc = data.index(b"\x2c")
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    data[desc:desc] = gce
    out = decode_gif(bytes(data))
    assert list(out[0, 0]) == [255, 255, 255]  # transparent -> white
    assert list(out[0, 1]) == [200, 100, 50]


def test_decode_image_sniffs_gif():
    from moosestack_spark.ops.gif import encode_gif
    from moosestack_spark.ops.multimodal import decode_image

    pal = np.array([[5, 6, 7]], np.uint8)
    idx = np.zeros((3, 4), np.int32)
    px = decode_image(encode_gif(idx, pal))
    assert px.shape == (3, 4, 3) and list(px[0, 0]) == [5, 6, 7]


def test_jpeg_420_subsampled_decode():
    """4:2:0 encoding (2x2 luma sampling, interleaved MCUs — the libjpeg
    default layout) exercises the decoder's multi-block MCU walk and
    chroma upsampling; smooth content bounds the subsampling loss."""
    import numpy as np

    from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:37, 0:53]  # odd dims: partial MCUs on both edges
    rgb = (
        np.stack([50 + x, 30 + y * 2, 100 + (x + y) // 2], axis=-1)
        .clip(0, 255)
        .astype(np.uint8)
    )
    dec = decode_jpeg(encode_jpeg(rgb, subsample=True)).astype(int)
    assert dec.shape == rgb.shape
    assert np.abs(dec - rgb.astype(int)).max() <= 8

    const = np.full((32, 32, 3), (90, 140, 200), dtype=np.uint8)
    dec2 = decode_jpeg(encode_jpeg(const, subsample=True)).astype(int)
    assert np.abs(dec2 - const.astype(int)).max() <= 2


def test_exif_parser_handles_big_endian_and_garbage(spark):
    """The gate plants little-endian blobs; the parser must also walk
    big-endian TIFF and reject non-TIFF bytes instead of crashing."""
    import struct

    from moosestack_spark.ops.multimodal_ext import parse_exif

    # big-endian: header + 1-entry IFD (orientation=6, SHORT hi-half)
    be = struct.pack(">2sHI", b"MM", 42, 8)
    be += struct.pack(">H", 1)
    be += struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 6, 0)
    be += struct.pack(">I", 0)
    rec = parse_exif(be)
    assert rec["orientation"] == 6 and rec["has_gps"] is False

    assert parse_exif(b"not a tiff")["width"] is None
    assert parse_exif(b"")["has_gps"] is False


def test_exif_roundtrip_gps_flag(spark):
    from moosestack_spark.ops.multimodal_ext import encode_exif, parse_exif

    for did in (0, 1, 4, 7, 513):
        rec = parse_exif(encode_exif(did))
        assert rec["width"] == 1 + did % 512
        assert rec["height"] == 1 + did % 384
        assert rec["orientation"] == 1 + did % 8
        assert rec["make"] == f"cam{did % 10}"
        assert rec["has_gps"] == (did % 4 == 0)
