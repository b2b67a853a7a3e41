"""WebP lossless (VP8L) codec — pure numpy/stdlib, no image libraries.

Implements the public "WebP Lossless Bitstream Specification" (RFC 9649 /
developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification):
RIFF/WEBP container walk, LSB-first bitstream, canonical prefix codes
(simple + full code-length-coded), color cache, LZ77 backward references,
and the subtract-green / predictor / color transforms.  The reference
engine (MooseStack) ships no codecs at all — this module exists for the
multimodal curation pipeline (decode → feature-extract as Arrow kernels),
same role as ops/png.py / ops/jpeg.py / ops/flac.py.

Honest boundaries (each raises, never silently wrong):
- VP8 (lossy) and VP8X (extended/animation) payloads: NotImplementedError.
- The 120-entry 2D distance-map table follows the spec's published list;
  the in-repo encoder always emits direct distance codes (plane code =
  dist + 120, always legal), so round-trips never depend on the table.

Encoder subset (``encode_webp_lossless``): literals + optional color cache
+ optional greedy LZ77 run references, with any of the four transforms
(subtract-green, constant-plan predictor/cross-color, first-appearance
palette with sub-byte bundling); prefix codes are canonical Huffman written
through the code-length code (literal lengths 0..15, no RLE symbols) or the
1-/2-symbol simple form when possible.  Output decodes under this module's
decoder AND is spec-conformant for external decoders.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O — VP8L is LSB-first within each byte (like DEFLATE)
# ---------------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos += n
        return v

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

MAX_CODE_LENGTH = 15
# fixed storage order of the code-length-code lengths (spec section 6.2.2.2)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


class HuffmanTree:
    """Canonical prefix decoder: bit-by-bit walk via a code->symbol dict
    (codes are at most 15 bits; dict lookup keyed on (length, code))."""

    __slots__ = ("table", "single")

    def __init__(self, code_lengths: list[int]) -> None:
        used = [(s, l) for s, l in enumerate(code_lengths) if l > 0]
        if not used:
            raise ValueError("empty prefix code")
        if len(used) == 1:
            # single-symbol code: emits its symbol consuming ZERO bits
            self.single: int | None = used[0][0]
            self.table: dict[tuple[int, int], int] = {}
            return
        self.single = None
        # canonical assignment: increasing length, then increasing symbol
        bl_count = [0] * (MAX_CODE_LENGTH + 1)
        for _, l in used:
            if l > MAX_CODE_LENGTH:
                raise ValueError(f"code length {l} > {MAX_CODE_LENGTH}")
            bl_count[l] += 1
        code = 0
        next_code = [0] * (MAX_CODE_LENGTH + 2)
        for l in range(1, MAX_CODE_LENGTH + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        self.table = {}
        for sym, l in sorted(used, key=lambda t: (t[1], t[0])):
            self.table[(l, next_code[l])] = sym
            next_code[l] += 1

    def read_symbol(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        while True:
            code = (code << 1) | br.read_bit()
            length += 1
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
            if length > MAX_CODE_LENGTH:
                raise ValueError("invalid prefix code in VP8L stream")


def _canonical_codes(code_lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under canonical assignment (encode side)."""
    tree = HuffmanTree(code_lengths)
    if tree.single is not None:
        return {tree.single: (0, 0)}
    return {sym: (code, l) for (l, code), sym in tree.table.items()}


def build_code_lengths(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    """Length-limited Huffman code lengths from symbol frequencies.  If the
    plain Huffman depth exceeds 15, frequencies are halved (ceil) and the
    tree rebuilt — converges to a flat code in the limit, always valid."""
    import heapq

    f = {s: c for s, c in freqs.items() if c > 0}
    lengths = [0] * alphabet_size
    if not f:
        raise ValueError("no symbols to code")
    if len(f) == 1:
        lengths[next(iter(f))] = 1
        return lengths
    cur = dict(f)
    while True:
        heap: list[tuple[int, int, list[int]]] = []
        uid = 0
        for s, c in cur.items():
            heap.append((c, uid, [s]))
            uid += 1
        heapq.heapify(heap)
        depth = {s: 0 for s in cur}
        while len(heap) > 1:
            c1, _, s1 = heapq.heappop(heap)
            c2, _, s2 = heapq.heappop(heap)
            for s in s1 + s2:
                depth[s] += 1
            heapq.heappush(heap, (c1 + c2, uid, s1 + s2))
            uid += 1
        if max(depth.values()) <= MAX_CODE_LENGTH:
            for s, d in depth.items():
                lengths[s] = d
            return lengths
        cur = {s: (c + 1) // 2 for s, c in cur.items()}


# ---------------------------------------------------------------------------
# prefix-coded Huffman code read/write (spec 6.2.2)
# ---------------------------------------------------------------------------


def _read_huffman_code(br: BitReader, alphabet_size: int) -> HuffmanTree:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_8bits = br.read_bit()
        sym0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            lengths[sym0] = 1  # HuffmanTree treats single-symbol as 0-bit
        else:
            sym1 = br.read(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        return HuffmanTree(lengths)
    # full code: the 19-symbol code-length code first
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CL_ORDER[i]] = br.read(3)
    cl_tree = HuffmanTree(cl_lengths)
    if br.read_bit():  # use_length: explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_tree.read_symbol(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:  # 18
                repeat, fill = 11 + br.read(7), 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    break
                lengths[symbol] = fill
                symbol += 1
    return HuffmanTree(lengths)


def _write_huffman_code(
    bw: BitWriter, code_lengths: list[int], codes: dict[int, tuple[int, int]]
) -> None:
    used = [s for s, l in enumerate(code_lengths) if l > 0]
    if len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        bw.write(1, 1)  # first symbol in 8 bits
        bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # full code
    # code-length code over literal lengths 0..15 (no RLE symbols)
    cl_freq: dict[int, int] = {}
    for l in code_lengths:
        cl_freq[l] = cl_freq.get(l, 0) + 1
    cl_lengths = build_code_lengths(cl_freq, 19)
    if sum(1 for l in cl_lengths if l) == 1:
        # single-length degenerate CL code must still be decodable: give the
        # lone symbol length 1 by adding a never-used partner
        lone = cl_lengths.index(1) if 1 in cl_lengths else max(
            i for i, l in enumerate(cl_lengths) if l
        )
        partner = 0 if lone != 0 else 1
        cl_lengths = [0] * 19
        cl_lengths[lone] = 1
        cl_lengths[partner] = 1
    # store all 19 in CL_ORDER (num_cl = 19 -> write 15 in 4 bits)
    bw.write(19 - 4, 4)
    for i in range(19):
        bw.write(cl_lengths[CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(0, 1)  # no explicit max_symbol: all lengths follow
    for l in code_lengths:
        code, n = cl_codes[l]
        bw.write(_reverse_bits(code, n), n)


def _reverse_bits(code: int, n: int) -> int:
    """Canonical codes are MSB-first; the stream is read bit-by-bit with
    code = (code<<1)|bit, so the encoder must emit the MSB first — i.e.,
    reversed relative to the LSB-first BitWriter."""
    out = 0
    for _ in range(n):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _emit(bw: BitWriter, codes: dict[int, tuple[int, int]], sym: int) -> None:
    code, n = codes[sym]
    bw.write(_reverse_bits(code, n), n)


# ---------------------------------------------------------------------------
# LZ77 prefix values (length and distance share the scheme, spec 6.2.3)
# ---------------------------------------------------------------------------


def _prefix_decode(br: BitReader, prefix_code: int) -> int:
    if prefix_code < 4:
        return prefix_code + 1
    extra_bits = (prefix_code - 2) >> 1
    offset = (2 + (prefix_code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (prefix_code, extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    highest = v.bit_length() - 1
    second = (v >> (highest - 1)) & 1
    prefix = 2 * highest + second
    extra_bits = highest - 1
    offset = (2 + second) << extra_bits
    return prefix, v - offset, extra_bits


# 2D distance-map table (spec 6.2.3): plane codes 1..120 map to pixel
# offsets in a neighborhood; codes > 120 are direct distances minus 120.
# The in-repo encoder only ever emits direct codes, so round-trips do not
# depend on this table; it exists to decode external encoders' output.
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (2, 8), (-2, 8), (7, 5), (-7, 5), (5, 7), (-5, 7), (8, 3),
    (0, 8), (1, 8), (-1, 8), (3, 8), (-3, 8), (8, 4), (6, 7), (-6, 7),
    (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def _plane_code_to_distance(xsize: int, plane_code: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    dx, dy = _DIST_MAP[plane_code - 1]
    dist = dx + dy * xsize
    return dist if dist >= 1 else 1


# ---------------------------------------------------------------------------
# color cache (spec 6.2.4): hash multiplier 0x1e35a7bd
# ---------------------------------------------------------------------------


class ColorCache:
    def __init__(self, bits: int) -> None:
        self.bits = bits
        self.slots = [0] * (1 << bits)

    def key(self, argb: int) -> int:
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - self.bits)

    def insert(self, argb: int) -> None:
        self.slots[self.key(argb)] = argb

    def lookup(self, k: int) -> int:
        return self.slots[k]


# ---------------------------------------------------------------------------
# spatially-coded image decode (spec 6.2) — used for the main ARGB image
# and for transform / entropy sub-images
# ---------------------------------------------------------------------------


def _decode_spatial(
    br: BitReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """Decode one spatially-coded image -> (h, w, 4) uint8 ARGB planes
    ordered [alpha, red, green, blue]."""
    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError(f"invalid color-cache bits {cache_bits}")
    meta_tree: np.ndarray | None = None
    meta_shift = 0
    n_groups = 1
    if allow_meta and br.read_bit():
        meta_shift = br.read(3) + 2
        mw = (w + (1 << meta_shift) - 1) >> meta_shift
        mh = (h + (1 << meta_shift) - 1) >> meta_shift
        meta_img = _decode_spatial(br, mw, mh, allow_meta=False)
        # meta code index = (red << 8) | green
        meta_tree = (
            meta_img[:, :, 1].astype(np.int32) << 8
        ) | meta_img[:, :, 2].astype(np.int32)
        n_groups = int(meta_tree.max()) + 1
    cache = ColorCache(cache_bits) if cache_bits else None
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        green = _read_huffman_code(br, green_alpha)
        red = _read_huffman_code(br, 256)
        blue = _read_huffman_code(br, 256)
        alpha = _read_huffman_code(br, 256)
        dist = _read_huffman_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    out = np.zeros((h * w, 4), dtype=np.uint8)  # A,R,G,B
    pos = 0
    total = h * w
    while pos < total:
        if meta_tree is not None:
            gx = (pos % w) >> meta_shift
            gy = (pos // w) >> meta_shift
            g_green, g_red, g_blue, g_alpha, g_dist = groups[
                int(meta_tree[gy, gx])
            ]
        else:
            g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
        s = g_green.read_symbol(br)
        if s < 256:
            r = g_red.read_symbol(br)
            b = g_blue.read_symbol(br)
            a = g_alpha.read_symbol(br)
            out[pos] = (a, r, s, b)
            if cache is not None:
                cache.insert((a << 24) | (r << 16) | (s << 8) | b)
            pos += 1
        elif s < 256 + 24:
            length = _prefix_decode(br, s - 256)
            dist_prefix = g_dist.read_symbol(br)
            plane_code = _prefix_decode(br, dist_prefix)
            distance = _plane_code_to_distance(w, plane_code)
            if distance > pos:
                raise ValueError("backward reference before image start")
            for _ in range(length):
                if pos >= total:
                    raise ValueError("backward reference past image end")
                out[pos] = out[pos - distance]
                if cache is not None:
                    a, r, g, b = (int(v) for v in out[pos])
                    cache.insert((a << 24) | (r << 16) | (g << 8) | b)
                pos += 1
        else:
            if cache is None:
                raise ValueError("cache symbol without color cache")
            argb = cache.lookup(s - 280)
            out[pos] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            cache.insert(argb)  # re-insert is a no-op on the same slot
            pos += 1
    return out.reshape(h, w, 4)


# ---------------------------------------------------------------------------
# transforms (spec 7) — inverse on decode
# ---------------------------------------------------------------------------


def _inv_subtract_green(img: np.ndarray) -> np.ndarray:
    g = img[:, :, 2].astype(np.int16)
    img[:, :, 1] = ((img[:, :, 1].astype(np.int16) + g) & 0xFF).astype(np.uint8)
    img[:, :, 3] = ((img[:, :, 3].astype(np.int16) + g) & 0xFF).astype(np.uint8)
    return img


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.int32) + b.astype(np.int32)) // 2


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """Spatial predictors 0..13 over int32 ARGB 4-vectors (spec 7.2)."""
    if mode == 0:
        return np.array([255, 0, 0, 0], dtype=np.int32)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = int(np.abs(p - L).sum())
        pt = int(np.abs(p - T).sum())
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(
            L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32),
            0,
            255,
        )
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(L, T)
        return np.clip(ave + (ave - TL.astype(np.int32)) // 2, 0, 255)
    raise ValueError(f"invalid predictor mode {mode}")


def _inv_predictor(img: np.ndarray, modes: np.ndarray, size_bits: int) -> np.ndarray:
    h, w, _ = img.shape
    out = img.astype(np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # last column: top-right wraps to the CURRENT row's first
                # pixel (linear-buffer semantics, already decoded)
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _palette_width_bits(table_size: int) -> int:
    """Sub-byte index bundling (spec 7.4): <=2 colors pack 8 px/green byte
    (width_bits 3), <=4 pack 4 (2), <=16 pack 2 (1), else unbundled (0)."""
    if table_size <= 2:
        return 3
    if table_size <= 4:
        return 2
    if table_size <= 16:
        return 1
    return 0


def _inv_palette(
    img: np.ndarray,
    width_bits: int,
    palette: np.ndarray,
    full_w: int,
    table_size: int,
) -> np.ndarray:
    """Unbundle packed green-channel indices and map through the palette.
    Out-of-range indices yield transparent black (libwebp semantics)."""
    h = img.shape[0]
    bpp = 8 >> width_bits
    mask = (1 << bpp) - 1
    out = np.zeros((h, full_w, 4), dtype=np.uint8)
    for y in range(h):
        for x in range(full_w):
            packed = int(img[y, x >> width_bits, 2])
            shift = (x & ((1 << width_bits) - 1)) * bpp
            idx = (packed >> shift) & mask
            if idx < table_size:
                out[y, x] = palette[idx]
    return out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic shift)."""
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _inv_color_transform(
    img: np.ndarray, elems: np.ndarray, size_bits: int
) -> np.ndarray:
    h, w, _ = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            e = elems[y >> size_bits, x >> size_bits]
            # ARGB packing: green_to_red lives in the BLUE channel,
            # green_to_blue in GREEN, red_to_blue in RED (spec 7.3 /
            # color_code bits 0-7, 8-15, 16-23)
            g2r, g2b, r2b = int(e[3]), int(e[2]), int(e[1])
            g = int(out[y, x, 2])
            r = (int(out[y, x, 1]) + _ct_delta(g2r, g)) & 0xFF
            b = (int(out[y, x, 3]) + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[y, x, 1] = r
            out[y, x, 3] = b
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L chunk payload -> (h, w, 4) uint8 RGBA pixels."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("not a VP8L stream (bad signature)")
    br = BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read_bit()  # alpha hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")
    transforms: list[tuple] = []
    cur_w = w  # color-indexing bundling reduces the width for later reads
    while br.read_bit():
        ttype = br.read(2)
        if ttype == 0:  # predictor
            size_bits = br.read(3) + 2
            mw = (cur_w + (1 << size_bits) - 1) >> size_bits
            mh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_spatial(br, mw, mh, allow_meta=False)
            transforms.append(("predictor", size_bits, sub[:, :, 2].copy()))
        elif ttype == 1:  # color transform
            size_bits = br.read(3) + 2
            mw = (cur_w + (1 << size_bits) - 1) >> size_bits
            mh = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_spatial(br, mw, mh, allow_meta=False)
            transforms.append(("color", size_bits, sub))
        elif ttype == 2:
            transforms.append(("subtract_green",))
        else:  # color indexing (palette), spec 7.4
            table_size = br.read(8) + 1
            pal_img = _decode_spatial(br, table_size, 1, allow_meta=False)
            # palette entries are delta-coded: cumulative sum mod 256
            palette = np.cumsum(
                pal_img[0].astype(np.int32), axis=0
            ) & 0xFF
            width_bits = _palette_width_bits(table_size)
            transforms.append(
                ("palette", width_bits, palette.astype(np.uint8), cur_w, table_size)
            )
            cur_w = (cur_w + (1 << width_bits) - 1) >> width_bits
    img = _decode_spatial(br, cur_w, h, allow_meta=True)
    # inverse transforms in reverse order of appearance
    for tr in reversed(transforms):
        if tr[0] == "subtract_green":
            img = _inv_subtract_green(img)
        elif tr[0] == "predictor":
            img = _inv_predictor(img, tr[2], tr[1])
        elif tr[0] == "palette":
            img = _inv_palette(img, tr[1], tr[2], tr[3], tr[4])
        else:
            img = _inv_color_transform(img, tr[2], tr[1])
    # ARGB planes -> RGBA
    return img[:, :, [1, 2, 3, 0]]


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (h, w, 3) uint8 RGB (alpha dropped, matching
    the other image decoders' contract)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    off = 12
    while off + 8 <= len(data):
        fourcc = data[off : off + 4]
        (size,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + size]
        if fourcc == b"VP8L":
            rgba = decode_vp8l(body)
            return rgba[:, :, :3].copy()
        if fourcc in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"WebP {fourcc.decode().strip()} (lossy/extended) decode "
                "not implemented; VP8L lossless decodes natively"
            )
        off += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("no VP8L chunk in WEBP container")


# ---------------------------------------------------------------------------
# encoder (lossless subset)
# ---------------------------------------------------------------------------


def _forward_subtract_green(img: np.ndarray) -> np.ndarray:
    g = img[:, :, 2].astype(np.int16)
    img[:, :, 1] = ((img[:, :, 1].astype(np.int16) - g) & 0xFF).astype(np.uint8)
    img[:, :, 3] = ((img[:, :, 3].astype(np.int16) - g) & 0xFF).astype(np.uint8)
    return img


def _forward_predictor(img: np.ndarray, mode: int) -> np.ndarray:
    """Residuals under a single constant predictor mode (what the encoder
    emits as a 1-block-covers-all sub-image)."""
    h, w, _ = img.shape
    src = img.astype(np.int32)
    out = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = src[0, x - 1]
            elif x == 0:
                pred = src[y - 1, 0]
            else:
                L = src[y, x - 1]
                T = src[y - 1, x]
                TL = src[y - 1, x - 1]
                TR = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                pred = _predict(mode, L, T, TL, TR)
            out[y, x] = (src[y, x] - pred) & 0xFF
    return out.astype(np.uint8)


def _forward_color_transform(img: np.ndarray, g2r: int, g2b: int, r2b: int) -> np.ndarray:
    h, w, _ = img.shape
    out = img.copy()
    for y in range(h):
        for x in range(w):
            g = int(img[y, x, 2])
            r0 = int(img[y, x, 1])
            r = (r0 - _ct_delta(g2r, g)) & 0xFF
            b = (int(img[y, x, 3]) - _ct_delta(g2b, g) - _ct_delta(r2b, r0)) & 0xFF
            out[y, x, 1] = r
            out[y, x, 3] = b
    return out


def _encode_spatial(
    bw: BitWriter,
    argb: np.ndarray,
    cache_bits: int = 0,
    use_lz77: bool = False,
    top_level: bool = True,
) -> None:
    """Encode an (h, w, 4) ARGB image as one spatially-coded image with a
    single prefix-code group (no meta codes)."""
    h, w, _ = argb.shape
    flat = argb.reshape(-1, 4).astype(np.int64)
    n = flat.shape[0]
    packed = (flat[:, 0] << 24) | (flat[:, 1] << 16) | (flat[:, 2] << 8) | flat[:, 3]

    # --- token stream: (kind, payload) ---
    cache = ColorCache(cache_bits) if cache_bits else None
    tokens: list[tuple] = []
    i = 0
    while i < n:
        if use_lz77 and i >= w and packed[i] == packed[i - 1]:
            # greedy run-length on distance 1 (direct plane code 121)
            run = 1
            while i + run < n and packed[i + run] == packed[i] and run < 4096:
                run += 1
            if run >= 4:
                tokens.append(("copy", run, 1))
                if cache is not None:
                    for j in range(run):
                        cache.insert(int(packed[i + j]))
                i += run
                continue
        if cache is not None:
            k = cache.key(int(packed[i]))
            if cache.lookup(k) == int(packed[i]) and tokens:
                tokens.append(("cache", k))
                cache.insert(int(packed[i]))
                i += 1
                continue
        a, r, g, b = (int(v) for v in flat[i])
        tokens.append(("lit", g, r, b, a))
        if cache is not None:
            cache.insert(int(packed[i]))
        i += 1

    # --- frequencies ---
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_alpha = 256 + 24 + cache_size
    fg: dict[int, int] = {}
    fr: dict[int, int] = {}
    fb: dict[int, int] = {}
    fa: dict[int, int] = {}
    fd: dict[int, int] = {}
    for tok in tokens:
        if tok[0] == "lit":
            _, g, r, b, a = tok
            fg[g] = fg.get(g, 0) + 1
            fr[r] = fr.get(r, 0) + 1
            fb[b] = fb.get(b, 0) + 1
            fa[a] = fa.get(a, 0) + 1
        elif tok[0] == "cache":
            fg[280 + tok[1]] = fg.get(280 + tok[1], 0) + 1
        else:  # copy
            lp, _, _ = _prefix_encode(tok[1])
            fg[256 + lp] = fg.get(256 + lp, 0) + 1
            dp, _, _ = _prefix_encode(tok[2] + 120)
            fd[dp] = fd.get(dp, 0) + 1
    for f in (fr, fb, fa, fd):
        if not f:
            f[0] = 1  # unused code still needs one decodable symbol

    # --- header: cache bit; the meta-prefix-code bit exists ONLY on the
    # top-level ARGB image (sub-images never carry meta codes) ---
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if top_level:
        bw.write(0, 1)  # no meta prefix codes

    trees = {}
    for name, freqs, size in (
        ("g", fg, green_alpha),
        ("r", fr, 256),
        ("b", fb, 256),
        ("a", fa, 256),
        ("d", fd, 40),
    ):
        lengths = build_code_lengths(freqs, size)
        _write_huffman_code(bw, lengths, _canonical_codes(lengths))
        trees[name] = _canonical_codes(lengths)

    # --- token emission ---
    for tok in tokens:
        if tok[0] == "lit":
            _, g, r, b, a = tok
            _emit(bw, trees["g"], g)
            _emit(bw, trees["r"], r)
            _emit(bw, trees["b"], b)
            _emit(bw, trees["a"], a)
        elif tok[0] == "cache":
            _emit(bw, trees["g"], 280 + tok[1])
        else:
            _, length, dist = tok
            lp, lev, leb = _prefix_encode(length)
            _emit(bw, trees["g"], 256 + lp)
            bw.write(lev, leb)
            dp, dev, deb = _prefix_encode(dist + 120)
            _emit(bw, trees["d"], dp)
            bw.write(dev, deb)


def _forward_palette(bw: BitWriter, argb: np.ndarray) -> np.ndarray:
    """Write the color-indexing transform (type 3) and return the packed
    reduced-width index image the main encode should operate on.  Palette
    order is first-appearance (deterministic); raises above 256 colors."""
    h, w, _ = argb.shape
    flat = argb.reshape(-1, 4)
    packed32 = (
        (flat[:, 0].astype(np.int64) << 24)
        | (flat[:, 1].astype(np.int64) << 16)
        | (flat[:, 2].astype(np.int64) << 8)
        | flat[:, 3].astype(np.int64)
    )
    uniq, first_pos = np.unique(packed32, return_index=True)
    order = np.argsort(first_pos)
    colors = uniq[order]
    if len(colors) > 256:
        raise ValueError(
            f"palette transform needs <=256 distinct colors, got {len(colors)}"
        )
    table_size = len(colors)
    index_of = {int(c): i for i, c in enumerate(colors)}
    bw.write(1, 1)
    bw.write(3, 2)
    bw.write(table_size - 1, 8)
    # delta-coded palette image (1 x table_size)
    pal = np.zeros((1, table_size, 4), dtype=np.uint8)
    prev = np.zeros(4, dtype=np.int32)
    for i, c in enumerate(colors):
        cur = np.array(
            [(c >> 24) & 0xFF, (c >> 16) & 0xFF, (c >> 8) & 0xFF, c & 0xFF],
            dtype=np.int32,
        )
        pal[0, i] = (cur - prev) & 0xFF
        prev = cur
    _encode_spatial(bw, pal, top_level=False)
    # bundle indices into the green channel, LSB-first within the byte
    width_bits = _palette_width_bits(table_size)
    bpp = 8 >> width_bits
    pw = (w + (1 << width_bits) - 1) >> width_bits
    out = np.zeros((h, pw, 4), dtype=np.uint8)
    out[:, :, 0] = 255  # libwebp packs 0xff000000 | (code << 8)
    idx = np.array([index_of[int(p)] for p in packed32], dtype=np.int64).reshape(h, w)
    for y in range(h):
        for x in range(w):
            out[y, x >> width_bits, 2] |= idx[y, x] << (
                (x & ((1 << width_bits) - 1)) * bpp
            )
    return out


def _encode_const_subimage(bw: BitWriter, w: int, h: int, argb: tuple) -> None:
    """Sub-image whose every pixel is the constant ``argb`` 4-tuple —
    the 1-mode predictor / 1-element color-transform case."""
    a, r, g, b = argb
    img = np.zeros((h, w, 4), dtype=np.uint8)
    img[:, :] = (a, r, g, b)
    _encode_spatial(bw, img, cache_bits=0, use_lz77=False, top_level=False)


def encode_webp_lossless(
    pixels: np.ndarray,
    transform: str = "none",
    predictor_mode: int = 2,
    color_elem: tuple[int, int, int] = (16, 8, 4),
    cache_bits: int = 0,
    use_lz77: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB (or (h, w, 4) RGBA) -> RIFF/WEBP VP8L bytes.

    transform: 'none' | 'subtract_green' | 'predictor' | 'color'.
    Predictor/color transforms use one block covering the whole image
    (size_bits chosen so ceil(dim / block) == 1), exercising the decoder's
    real transform machinery with an honestly-encodable constant plan."""
    if pixels.ndim != 3 or pixels.shape[2] not in (3, 4):
        raise ValueError("pixels must be (h, w, 3|4) uint8")
    h, w = pixels.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L dimensions must be 1..16384")
    argb = np.zeros((h, w, 4), dtype=np.uint8)
    argb[:, :, 1] = pixels[:, :, 0]
    argb[:, :, 2] = pixels[:, :, 1]
    argb[:, :, 3] = pixels[:, :, 2]
    argb[:, :, 0] = pixels[:, :, 3] if pixels.shape[2] == 4 else 255

    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if pixels.shape[2] == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version

    # constant transform plan: size_bits maxes at 9 (3-bit field), so the
    # sub-image is ceil(dim/512) per side — 1x1 for gate-sized images,
    # still correct (all-same-element) for larger ones
    size_bits = min(9, max(2, max(w - 1, h - 1).bit_length()))
    mw = (w + (1 << size_bits) - 1) >> size_bits
    mh = (h + (1 << size_bits) - 1) >> size_bits
    if transform == "subtract_green":
        bw.write(1, 1)
        bw.write(2, 2)
        argb = _forward_subtract_green(argb)
    elif transform == "predictor":
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(size_bits - 2, 3)
        _encode_const_subimage(bw, mw, mh, (0, 0, predictor_mode, 0))
        argb = _forward_predictor(argb, predictor_mode)
    elif transform == "color":
        g2r, g2b, r2b = color_elem
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(size_bits - 2, 3)
        # element packing (spec 7.3): g2r -> blue channel, g2b -> green,
        # r2b -> red
        _encode_const_subimage(bw, mw, mh, (0, r2b, g2b, g2r))
        argb = _forward_color_transform(argb, g2r, g2b, r2b)
    elif transform == "palette":
        argb = _forward_palette(bw, argb)
    elif transform != "none":
        raise ValueError(f"unknown transform {transform!r}")
    bw.write(0, 1)  # no more transforms

    _encode_spatial(bw, argb, cache_bits=cache_bits, use_lz77=use_lz77)
    payload = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
