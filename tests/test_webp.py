"""WebP VP8L codec: lossless round-trips across every encoder configuration,
container/sniffer routing, and the declared honest boundaries."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from moosestack_spark.ops.webp import (
    BitReader,
    BitWriter,
    HuffmanTree,
    build_code_lengths,
    decode_vp8l,
    decode_webp,
    encode_webp_lossless,
)

RNG = np.random.RandomState(42)


def _images(h, w):
    rand = RNG.randint(0, 256, (h, w, 3), dtype=np.uint8)
    grad = np.zeros((h, w, 3), np.uint8)
    for y in range(h):
        for x in range(w):
            grad[y, x] = ((x * 3) % 256, (y * 5) % 256, (x + y) % 256)
    flat = np.tile(np.array([[10, 200, 30]], np.uint8), (h * w, 1)).reshape(h, w, 3)
    return {"rand": rand, "grad": grad, "flat": flat}


@pytest.mark.parametrize("shape", [(1, 1), (3, 5), (16, 16), (13, 31), (64, 48)])
@pytest.mark.parametrize(
    "transform", ["none", "subtract_green", "predictor", "color"]
)
def test_roundtrip_transforms(shape, transform):
    h, w = shape
    for name, img in _images(h, w).items():
        for cache_bits in (0, 4):
            for lz in (False, True):
                data = encode_webp_lossless(
                    img, transform=transform, cache_bits=cache_bits, use_lz77=lz
                )
                out = decode_webp(data)
                assert out.shape == img.shape
                assert (out == img).all(), (name, transform, cache_bits, lz)


def test_all_predictor_modes_roundtrip():
    img = RNG.randint(0, 256, (9, 11, 3), dtype=np.uint8)
    for mode in range(14):
        data = encode_webp_lossless(img, transform="predictor", predictor_mode=mode)
        assert (decode_webp(data) == img).all(), f"mode {mode}"


def test_rgba_alpha_preserved_in_vp8l():
    rgba = RNG.randint(0, 256, (5, 7, 4), dtype=np.uint8)
    data = encode_webp_lossless(rgba)
    (size,) = struct.unpack("<I", data[16:20])
    body = data[20 : 20 + size]
    assert (decode_vp8l(body) == rgba).all()
    # container decode drops alpha by contract
    assert (decode_webp(data) == rgba[:, :, :3]).all()


def test_compression_is_real():
    """A flat image must compress far below raw size (cache+LZ77 path)."""
    flat = np.full((64, 48, 3), 77, dtype=np.uint8)
    data = encode_webp_lossless(flat, cache_bits=4, use_lz77=True)
    assert len(data) < 200  # raw would be 9216 bytes
    assert (decode_webp(data) == flat).all()


def test_sniffer_routes_webp():
    from moosestack_spark.ops.multimodal import decode_image

    img = RNG.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    data = encode_webp_lossless(img, transform="subtract_green")
    assert (decode_image(data) == img).all()


def test_lossy_and_extended_raise_honestly():
    # minimal RIFF/WEBP wrapping a VP8 (lossy) chunk
    body = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
    riff = b"WEBP" + body
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(data)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")


@pytest.mark.parametrize("ncolors", [1, 2, 3, 4, 9, 16, 17, 200])
def test_palette_roundtrip_every_bundling_tier(ncolors):
    """Color-indexing transform across the bundling tiers: 8/4/2/1 pixels
    per green byte for <=2/<=4/<=16/>16 colors."""
    rng = np.random.RandomState(ncolors)
    colors = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    for (h, w) in [(1, 1), (5, 7), (13, 31)]:
        img = colors[rng.randint(0, ncolors, (h, w))]
        for lz in (False, True):
            data = encode_webp_lossless(img, transform="palette", use_lz77=lz)
            assert (decode_webp(data) == img).all(), (ncolors, h, w, lz)


def test_palette_rejects_too_many_colors():
    img = np.zeros((20, 20, 3), np.uint8)
    v = np.arange(400)
    img[:, :, 0] = (v % 256).reshape(20, 20)
    img[:, :, 1] = (v // 256).reshape(20, 20)  # 400 distinct colors
    with pytest.raises(ValueError, match="256"):
        encode_webp_lossless(img, transform="palette")


def test_palette_beats_raw_on_two_tone():
    img = np.zeros((64, 64, 3), np.uint8)
    img[::2] = (255, 0, 0)
    data = encode_webp_lossless(img, transform="palette", use_lz77=True)
    assert len(data) < 300
    assert (decode_webp(data) == img).all()


def test_huffman_canonical_agrees_with_deflate_convention():
    # lengths [2,1,3,3] -> canonical codes 10,0,110,111 (DEFLATE example)
    tree = HuffmanTree([2, 1, 3, 3])
    br = BitReader(bytes([0b0_1_011_01 & 0xFF, 0b111_011_0 >> 0]))
    # stream written MSB-of-code-first, LSB-first bit packing:
    # sym1 ('0'), sym0 ('10'=bits 1,0), sym2('110'), sym3('111')
    bw = BitWriter()
    for bits in ("0", "10", "110", "111"):
        for b in bits:
            bw.write(int(b), 1)
    br = BitReader(bw.bytes())
    assert [tree.read_symbol(br) for _ in range(4)] == [1, 0, 2, 3]


def test_build_code_lengths_limits_depth():
    # fibonacci frequencies force deep trees; lengths must cap at 15
    freqs = {}
    a, b = 1, 1
    for s in range(40):
        freqs[s] = a
        a, b = b, a + b
    lengths = build_code_lengths(freqs, 40)
    assert max(lengths) <= 15
    # Kraft inequality: sum 2^-l <= 1 (decodable)
    assert sum(2.0 ** -l for l in lengths if l) <= 1.0 + 1e-12


def test_backward_reference_decode_direct_distance():
    """Hand-exercise the LZ77 copy path: a long flat run encoded with
    use_lz77 emits real length/distance symbols; decode must replay them."""
    img = np.zeros((4, 64, 3), dtype=np.uint8)
    img[:, :, 0] = 200
    data = encode_webp_lossless(img, use_lz77=True)
    assert (decode_webp(data) == img).all()
    # mixed content: runs interrupted by noise
    img2 = img.copy()
    img2[1, 10] = (1, 2, 3)
    img2[3, 40] = (9, 8, 7)
    data2 = encode_webp_lossless(img2, use_lz77=True, cache_bits=6)
    assert (decode_webp(data2) == img2).all()


def test_dimension_validation():
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((0, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        encode_webp_lossless(np.zeros((4, 4, 2), np.uint8))


def test_meta_prefix_codes_decode():
    """Hand-build a VP8L stream with TWO prefix-code groups selected by an
    entropy image (meta codes) — the decoder path no in-repo encoder
    emits.  Left half pixels come from group 0 (solid red), right half
    from group 1 (solid blue); a decoder ignoring the meta selection
    produces the wrong halves."""
    import numpy as np

    from moosestack_spark.ops.webp import (
        BitWriter,
        _canonical_codes,
        _emit,
        _encode_spatial,
        _write_huffman_code,
        build_code_lengths,
        decode_vp8l,
    )

    w, h = 8, 4
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes PRESENT
    huffman_bits = 2  # 4-pixel blocks -> entropy image 2x1
    bw.write(huffman_bits - 2, 3)
    # entropy image: (red<<8)|green = meta index; left block 0, right block 1
    ent = np.zeros((1, 2, 4), dtype=np.uint8)
    ent[0, 0, 2] = 0  # green: meta code 0
    ent[0, 1, 2] = 1  # meta code 1
    _encode_spatial(bw, ent, top_level=False)
    # two groups; group 0 emits red=200, group 1 emits blue=90
    for g_lit, r_lit, b_lit in [(10, 200, 0), (20, 0, 90)]:
        for val, size in [(g_lit, 256 + 24), (r_lit, 256), (b_lit, 256), (255, 256), (0, 40)]:
            lengths = build_code_lengths({val: 1}, size)
            _write_huffman_code(bw, lengths, _canonical_codes(lengths))
    # literals: group chosen by x >> huffman_bits (all zero-bit codes, so
    # nothing to emit per pixel — the stream IS the header)
    rgba = decode_vp8l(b"\x2f" + bw.bytes() + b"\x00" * 4)
    left, right = rgba[:, :4], rgba[:, 4:]
    assert (left[:, :, 0] == 200).all() and (left[:, :, 2] == 0).all()
    assert (right[:, :, 0] == 0).all() and (right[:, :, 2] == 90).all()
    assert (rgba[:, :, 1] == np.where(np.arange(w)[None, :] < 4, 10, 20)).all()
