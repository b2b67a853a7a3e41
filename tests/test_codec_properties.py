"""Property-based codec tests (hypothesis): the JPEG/PNG/MP4 coders must
hold their contracts on arbitrary inputs, not just the hand-picked cases.

- PNG: lossless roundtrip for ANY uint8 image (gray + RGB, odd dims).
- JPEG: constant-tile images roundtrip EXACTLY (the oracle-gated
  property); arbitrary images roundtrip within the near-lossless bound.
- MP4: metadata roundtrip for any (duration, w, h) in the sane range.

Pure numpy/stdlib — no SparkSession, so these run in milliseconds.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from moosestack_spark.ops.jpeg import decode_jpeg, encode_jpeg
from moosestack_spark.ops.multimodal import encode_minimal_mp4, parse_mp4_metadata
from moosestack_spark.ops.png import decode_png, encode_png

dims = st.integers(min_value=1, max_value=40)


@settings(max_examples=25, deadline=None)
@given(h=dims, w=dims, seed=st.integers(0, 2**32 - 1), gray=st.booleans())
def test_png_roundtrip_any_image(h, w, seed, gray):
    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    got = decode_png(encode_png(img))
    assert got.shape == (h, w, 3)
    if gray:
        assert np.array_equal(got[..., 0], img)
        assert np.array_equal(got[..., 0], got[..., 2])
    else:
        assert np.array_equal(got, img)


@settings(max_examples=25, deadline=None)
@given(
    th=st.integers(1, 4),
    tw=st.integers(1, 5),
    seed=st.integers(0, 2**32 - 1),
)
def test_jpeg_constant_tiles_exact_any_values(th, tw, seed):
    rng = np.random.default_rng(seed)
    tiles = rng.integers(0, 256, (th, tw), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    got = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(got[..., 0], img)


@settings(max_examples=15, deadline=None)
@given(h=st.integers(1, 32), w=st.integers(1, 32), seed=st.integers(0, 2**32 - 1))
def test_jpeg_arbitrary_image_bounded_error(h, w, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w), dtype=np.uint8)
    got = decode_jpeg(encode_jpeg(img))[..., 0].astype(int)
    # worst-case random noise stresses every AC category; the near-lossless
    # table (DC step 1, AC step 2) bounds reconstruction error tightly
    assert got.shape == (h, w)
    assert np.abs(got - img.astype(int)).max() <= 16


@settings(max_examples=50, deadline=None)
@given(
    dur=st.integers(1, 10**9),
    w=st.integers(1, 8192),
    h=st.integers(1, 8192),
)
def test_mp4_metadata_roundtrip_any(dur, w, h):
    meta = parse_mp4_metadata(encode_minimal_mp4(dur, w, h))
    assert meta == {"duration_ms": dur, "width": w, "height": h, "n_tracks": 1}


def test_png_adam7_interlaced_roundtrip():
    """Adam7 decode: every pass is an independently-filtered sub-image;
    odd sizes exercise pass-boundary math (empty passes, partial rows)."""
    import numpy as np

    from moosestack_spark.ops.png import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(1, 1, 3), (3, 5, 3), (8, 8, 3), (13, 17, 3), (7, 1, 3), (1, 9, 3)]:
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px, interlace=True)), px), shape
    g = rng.integers(0, 256, (11, 6), dtype=np.uint8)
    assert np.array_equal(
        decode_png(encode_png(g, interlace=True)),
        np.repeat(g[..., None], 3, axis=2),
    )


def test_flac_roundtrip_all_modes():
    """Lossless round-trip across every subframe type, odd block
    boundaries, stereo independent + mid/side decorrelation."""
    import numpy as np

    from moosestack_spark.ops.flac import decode_flac, encode_flac

    rng = np.random.default_rng(5)
    mono = rng.integers(-3000, 3000, 5000).astype(np.int16)
    for modes in [
        ("verbatim",), ("fixed0",), ("fixed1",), ("fixed2",), ("lpc2",),
        ("fixed2", "verbatim", "lpc2", "fixed1"),
    ]:
        dec, rate = decode_flac(
            encode_flac(mono, 22050, block_size=999, modes=modes)
        )
        assert rate == 22050
        assert np.array_equal(dec[:, 0], mono.astype(np.int32)), modes

    const = np.full(2000, 123, dtype=np.int16)
    dec, _ = decode_flac(encode_flac(const, 8000, modes=("constant",)))
    assert np.array_equal(dec[:, 0], const.astype(np.int32))

    stereo = np.stack([mono, (mono // 2 + 100).astype(np.int16)], axis=1)
    dec, _ = decode_flac(encode_flac(stereo, 16000, block_size=777))
    assert np.array_equal(dec, stereo.astype(np.int32))
    dec, _ = decode_flac(
        encode_flac(stereo, 16000, block_size=777,
                    modes=("lpc2", "fixed1"), mid_side=True)
    )
    assert np.array_equal(dec, stereo.astype(np.int32))


def test_flac_rejects_corruption():
    import numpy as np
    import pytest

    from moosestack_spark.ops.flac import decode_flac, encode_flac

    good = bytearray(encode_flac(np.arange(500, dtype=np.int16), 8000))
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"junk" + bytes(good))
    # flip a byte inside the first frame: either the entropy layer or the
    # CRC-16 must reject it — corruption never yields silent wrong samples
    bad = bytearray(good)
    bad[-10] ^= 0xFF
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # flip one of the trailing CRC bytes specifically: CRC-16 catches it
    bad2 = bytearray(good)
    bad2[-1] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad2))


def test_decode_wav_sniffs_flac():
    import numpy as np

    from moosestack_spark.ops.flac import encode_flac
    from moosestack_spark.ops.multimodal import decode_wav

    src = (np.arange(800) % 400 - 200).astype(np.int16)
    out, rate = decode_wav(encode_flac(src, 16000))
    assert rate == 16000 and np.array_equal(out, src)


def test_tiff_roundtrip_all_compressions():
    """TIFF codec: none / PackBits / LZW(+predictor) strips round-trip
    bit-exactly, grayscale and RGB, multi-strip layouts."""
    import numpy as np

    from moosestack_spark.ops.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(3)
    for comp in ("none", "packbits", "lzw"):
        g = rng.integers(0, 256, (23, 9), dtype=np.uint8)
        assert np.array_equal(
            decode_tiff(encode_tiff(g, comp, rows_per_strip=6)),
            np.repeat(g[..., None], 3, axis=2),
        ), comp
        c = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_tiff(encode_tiff(c, comp, rows_per_strip=5)), c
        ), comp
    im = rng.integers(0, 256, (12, 31, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_tiff(encode_tiff(im, "lzw", predictor=True)), im
    )
    # repetitive content exercises PackBits runs and LZW width growth
    flat = np.tile(np.arange(64, dtype=np.uint8), (40, 4))
    for comp in ("packbits", "lzw"):
        assert np.array_equal(
            decode_tiff(encode_tiff(flat, comp))[..., 0], flat
        ), comp


@settings(max_examples=25, deadline=None)
@given(
    h=dims,
    w=dims,
    seed=st.integers(0, 2**32 - 1),
    transform=st.sampled_from(["none", "subtract_green", "predictor", "color"]),
    cache_bits=st.sampled_from([0, 3, 6]),
    lz=st.booleans(),
)
def test_webp_roundtrip_any_image(h, w, seed, transform, cache_bits, lz):
    from moosestack_spark.ops.webp import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    data = encode_webp_lossless(
        img,
        transform=transform,
        predictor_mode=seed % 14,
        cache_bits=cache_bits,
        use_lz77=lz,
    )
    assert np.array_equal(decode_webp(data), img)


@settings(max_examples=25, deadline=None)
@given(
    h=dims,
    w=dims,
    ncolors=st.integers(1, 20),
    seed=st.integers(0, 2**32 - 1),
)
def test_webp_palette_roundtrip_any_image(h, w, ncolors, seed):
    from moosestack_spark.ops.webp import decode_webp, encode_webp_lossless

    rng = np.random.default_rng(seed)
    colors = rng.integers(0, 256, (ncolors, 3), dtype=np.uint8)
    img = colors[rng.integers(0, ncolors, (h, w))]
    data = encode_webp_lossless(img, transform="palette", use_lz77=bool(seed % 2))
    assert np.array_equal(decode_webp(data), img)


@settings(max_examples=25, deadline=None)
@given(
    packet_lens=st.lists(st.integers(0, 70000), min_size=1, max_size=6),
    seed=st.integers(0, 2**32 - 1),
)
def test_ogg_packet_framing_any_lengths(packet_lens, seed):
    """Page framing must reassemble arbitrary packet lengths — incl. 0,
    exact multiples of 255, and >255*255 continuation spans."""
    from moosestack_spark.ops.ogg import parse_ogg, write_ogg

    rng = np.random.default_rng(seed)
    pkts = [bytes(rng.integers(0, 256, n, dtype=np.uint8)) for n in packet_lens]
    data = write_ogg([(p, i) for i, p in enumerate(pkts)])
    assert parse_ogg(data) == pkts


@settings(max_examples=10, deadline=None)
@given(
    n=st.integers(1, 3000),
    block=st.sampled_from([192, 256, 576]),
    seed=st.integers(0, 2**32 - 1),
    stereo=st.booleans(),
)
def test_ogg_flac_roundtrip_any_signal(n, block, seed, stereo):
    from moosestack_spark.ops.ogg import decode_ogg_flac, encode_ogg_flac

    rng = np.random.default_rng(seed)
    shape = (n, 2) if stereo else (n,)
    sig = rng.integers(-3000, 3000, shape).astype(np.int16)
    data = encode_ogg_flac(
        sig, rate=16000, block_size=block,
        modes=("fixed2", "verbatim", "lpc2", "fixed0"), mid_side=stereo,
    )
    out, rate = decode_ogg_flac(data)
    assert rate == 16000
    expect = sig if stereo else sig[:, None]
    assert np.array_equal(out, expect)


def test_tiff_tiled_and_16bit_roundtrips():
    """Tile layout (padded edge tiles) and 16-bit samples, every
    compression, both through the exact 16-bit surface and the uint8
    high-byte contract."""
    import numpy as np

    from moosestack_spark.ops.tiff import (
        decode_tiff,
        decode_tiff16,
        encode_tiff_tiled,
    )

    rng = np.random.default_rng(11)
    for comp in ("none", "packbits", "lzw"):
        rgb = rng.integers(0, 256, size=(21, 35, 3)).astype(np.uint8)
        enc = encode_tiff_tiled(rgb, tile=(16, 8), compression=comp)
        assert np.array_equal(decode_tiff(enc), rgb)

        g16 = rng.integers(0, 65536, size=(19, 13)).astype(np.uint16)
        enc16 = encode_tiff_tiled(g16, tile=(8, 8), compression=comp, bits=16)
        assert np.array_equal(decode_tiff16(enc16)[..., 0], g16)
        assert np.array_equal(decode_tiff(enc16)[..., 0], (g16 >> 8).astype(np.uint8))

    # predictor at 16-bit depth differs per SAMPLE, not per byte
    rgb16 = rng.integers(0, 65536, size=(17, 23, 3)).astype(np.uint16)
    enc = encode_tiff_tiled(rgb16, tile=(16, 16), compression="lzw",
                            predictor=True, bits=16)
    assert np.array_equal(decode_tiff16(enc), rgb16)


def test_tiff_palette_without_colormap_refuses():
    # palette DECODES for real now (encode_tiff_palette round-trips below);
    # a photometric-3 file without its ColorMap tag is still a loud error
    import numpy as np
    import pytest
    import struct

    from moosestack_spark.ops.tiff import decode_tiff, encode_tiff

    enc = bytearray(encode_tiff(np.zeros((4, 4), np.uint8), "none"))
    # patch photometric (tag 262) to 3 = palette, leaving no ColorMap
    (n,) = struct.unpack_from("<H", enc, 8)
    for i in range(n):
        tag, = struct.unpack_from("<H", enc, 10 + i * 12)
        if tag == 262:
            struct.pack_into("<H", enc, 10 + i * 12 + 8, 3)
    with pytest.raises(ValueError, match="missing ColorMap"):
        decode_tiff(bytes(enc))


def test_tiff_palette_roundtrips():
    """Palette TIFF (photometric 3): 4-bit packed (odd widths exercise the
    row byte-alignment) and 8-bit indices, all three compressions,
    multi-strip, exact through the ColorMap (value*257 SHORT convention)."""
    import numpy as np

    from moosestack_spark.ops.tiff import decode_tiff, encode_tiff_palette

    rng = np.random.RandomState(11)
    for bits in (4, 8):
        ncol = 1 << bits
        cmap = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        for w in (7, 8, 33):
            idx = rng.randint(0, ncol, (13, w)).astype(np.uint8)
            for comp in ("none", "packbits", "lzw"):
                got = decode_tiff(
                    encode_tiff_palette(
                        idx, cmap, bits=bits, compression=comp, rows_per_strip=5
                    )
                )
                assert np.array_equal(got, cmap[idx]), (bits, w, comp)


def test_tiff_palette_boundaries_loud():
    import struct

    import numpy as np
    import pytest as _pytest

    from moosestack_spark.ops.tiff import decode_tiff, encode_tiff_palette

    cmap = np.zeros((16, 3), np.uint8)
    idx = np.zeros((4, 4), np.uint8)
    with _pytest.raises(ValueError, match="colormap must be"):
        encode_tiff_palette(idx, np.zeros((8, 3), np.uint8), bits=4)
    with _pytest.raises(ValueError, match="out of colormap range"):
        encode_tiff_palette(np.full((2, 2), 16, np.uint8), cmap, bits=4)
    # 2-bit palette refused on decode
    data = bytearray(encode_tiff_palette(idx, cmap, bits=4))
    i = data.find(struct.pack("<HHIHH", 258, 3, 1, 4, 0))
    struct.pack_into("<HHIHH", data, i, 258, 3, 1, 2, 0)
    with _pytest.raises(NotImplementedError, match="palette TIFF not supported"):
        decode_tiff(bytes(data))
    # missing ColorMap refused
    data = bytearray(encode_tiff_palette(idx, cmap, bits=4))
    j = data.find(struct.pack("<HH", 320, 3))
    struct.pack_into("<H", data, j, 32000)  # rename the tag away
    with _pytest.raises(ValueError, match="missing ColorMap"):
        decode_tiff(bytes(data))
