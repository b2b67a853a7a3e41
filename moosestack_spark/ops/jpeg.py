"""Pure-numpy baseline JPEG codec (no PIL/opencv in the container).

Decoder: baseline sequential DCT (SOF0), 8-bit samples, grayscale or
interleaved color with any sampling factors up to 2x2 (4:4:4, 4:2:2,
4:2:0), multiple DQT/DHT segments, 8- and 16-bit quant tables, restart
markers, 0xFF00 byte stuffing.  Progressive (SOF2), arithmetic coding and
12-bit precision raise NotImplementedError — that boundary is honest, not
a stub: everything a baseline encoder can emit decodes here.

Encoder: grayscale or 4:4:4 color, standard Annex-K Huffman tables,
caller-supplied quantization tables.  Exists to plant real JPEG bytes for
tests and gate queries; the decoder is the production surface.

Determinism note for the oracle-gated path: an 8x8 block with constant
sample v has DCT coefficients DC = 8*(v-128), AC = 0.  With a unit DC
quant step the roundtrip is exact (decode returns v bit-for-bit), so a
JPEG built from constant tiles has SQL-replayable decoded pixels — that is
what multimodal's JPEG gate query exploits.  General images roundtrip
within a small bound (test_multimodal.py pins it).

Used by ops/multimodal.decode_image via payload sniffing (FFD8 magic).
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16).
# block_dct = A @ f @ A.T ; idct = A.T @ F @ A.  Built once at import.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)

# Annex K standard Huffman tables: (bits[1..16], huffval) per table.
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# Near-lossless quant table used by the deterministic test content: unit DC
# step (constant blocks roundtrip EXACTLY — see module docstring), AC step 2
# (keeps every AC magnitude within the standard table's 10-bit categories).
Q_NEAR_LOSSLESS = np.full(64, 2, dtype=np.int64)
Q_NEAR_LOSSLESS[0] = 1


def _build_huffman_decode(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol: (code_length, code)} — inverse of the decode table."""
    return {sym: lc for lc, sym in _build_huffman_decode(bits, huffval).items()}


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; the caller has
    already removed 0xFF00 stuffing and split at RST markers."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """JPEG EXTEND: map t-bit unsigned v to the signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Smallest t with |v| < 2^t (JPEG magnitude category)."""
    t = 0
    a = abs(v)
    while a:
        a >>= 1
        t += 1
    return t


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> HxWx3 uint8 RGB (grayscale replicated to 3 chans)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, components) ; component = (cid, hsamp, vsamp, tq)
    restart_interval = 0
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at byte {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM / RSTn: no payload
            continue
        seg_len = struct.unpack_from(">H", data, i)[0]
        seg = data[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, j).astype(np.int64)
                    j += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, j).astype(np.int64)
                    j += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                huffval = list(seg[j + 17 : j + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman_decode(
                    bits, huffval
                )
                j += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X}) not supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
            scan_start = i + seg_len
            return _decode_scan(
                data, scan_start, frame, scan_tables, qt, huff_dc, huff_ac,
                restart_interval,
            )
        # APPn / COM / others: skip
        i += seg_len
    raise ValueError("no scan (SOS) found")


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # split the entropy stream at RST markers, removing 0xFF00 stuffing
    segments: list[bytearray] = [bytearray()]
    j = pos
    end_pos = len(data)
    while j < len(data):
        b = data[j]
        if b == 0xFF:
            nxt = data[j + 1] if j + 1 < len(data) else 0xD9
            if nxt == 0x00:
                segments[-1].append(0xFF)
                j += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytearray())
                j += 2
                continue
            end_pos = j
            break
        segments[-1].append(b)
        j += 1

    planes = {
        cid: np.zeros((mcus_y * v * 8, mcus_x * hs * 8), dtype=np.float64)
        for cid, hs, v, _ in comps
    }
    reader = _BitReader(bytes(segments[0]))
    seg_idx = 0
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                reader = _BitReader(bytes(segments[seg_idx]))
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, tq in comps:
                td, ta = scan_tables[cid]
                for by in range(vs):
                    for bx in range(hs):
                        block = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], qt[tq], pred, cid
                        )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample each component to full size (nearest/replicate) and crop
    out = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        y = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    if len(out) != 3:
        raise NotImplementedError(f"{len(out)}-component JPEG not supported")
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table, quant, pred, cid) -> np.ndarray:
    coef = np.zeros(64, dtype=np.int64)
    t = reader.decode_symbol(dc_table)
    diff = _extend(reader.read_bits(t), t)
    pred[cid] += diff
    coef[0] = pred[cid]
    k = 1
    while k < 64:
        rs = reader.decode_symbol(ac_table)
        r, s = rs >> 4, rs & 0x0F
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _extend(reader.read_bits(s), s)
        k += 1
    dq = (coef * quant).astype(np.float64)
    blk = np.zeros((8, 8))
    blk.flat[ZIGZAG] = dq  # de-zigzag into natural order
    return _A.T @ blk @ _A + 128.0


# --------------------------------------------------------------------------
# encoder (grayscale / 4:4:4) — plants real bytes for tests and gates
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _encode_block(writer, block, quant, pred_holder, dc_enc, ac_enc) -> None:
    F_ = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    q = np.round(F_.flat[ZIGZAG] / quant).astype(np.int64)  # zigzag order
    diff = int(q[0]) - pred_holder[0]
    pred_holder[0] = int(q[0])
    t = _category(diff)
    ln, code = dc_enc[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    # AC: run-length of zeros + category
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if q[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            writer.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_enc[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]
        writer.write(code, ln)


def _dqt_segment(tq: int, quant: np.ndarray) -> bytes:
    return struct.pack(">HB", 2 + 1 + 64, tq) + bytes(int(v) for v in quant)


def _dht_segment(tc: int, th: int, bits, huffval) -> bytes:
    body = bytes([(tc << 4) | th, *bits, *huffval])
    return struct.pack(">H", 2 + len(body)) + body


def _pad_block(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8x8 block at (ys, xs) with edge replication into padding."""
    h, w = plane.shape
    blk = np.full((8, 8), 128.0)
    tile = plane[ys : min(ys + 8, h), xs : min(xs + 8, w)]
    if tile.size == 0:
        return blk
    blk[: tile.shape[0], : tile.shape[1]] = tile
    if tile.shape[0] < 8:
        blk[tile.shape[0] :, :] = blk[tile.shape[0] - 1, :]
    if tile.shape[1] < 8:
        blk[:, tile.shape[1] :] = blk[:, tile.shape[1] - 1 : tile.shape[1]]
    return blk


def encode_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray = Q_NEAR_LOSSLESS,
    subsample: bool = False,
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> baseline JPEG.  Color is
    4:4:4 by default; `subsample=True` emits 4:2:0 (2x2 luma sampling,
    chroma averaged over 2x2 — the layout libjpeg produces by default,
    used to exercise the decoder's interleaved-MCU walk).  `quant` is the
    64-entry zigzag-order quantization table (shared by luma and chroma;
    default near-lossless)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
        subsample = False
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.round(c), 0, 255) for c in (y, cb, cr)]
        if subsample:
            # chroma = mean over 2x2 (pad odd dims by edge replication)
            def down(c: np.ndarray) -> np.ndarray:
                ph, pw = (h + 1) & ~1, (w + 1) & ~1
                full = np.empty((ph, pw))
                full[:h, :w] = c
                if ph > h:
                    full[h:, :w] = c[h - 1 : h, :]
                if pw > w:
                    full[:, w:] = full[:, w - 1 : w]
                return np.round(
                    (full[0::2, 0::2] + full[0::2, 1::2]
                     + full[1::2, 0::2] + full[1::2, 1::2]) / 4.0
                )

            planes = [planes[0], down(planes[1]), down(planes[2])]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + _dqt_segment(0, quant)
    ncomp = 1 if gray else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    luma_hv = 0x22 if subsample else 0x11
    for c in range(ncomp):
        sof += bytes([c + 1, luma_hv if c == 0 else 0x11, 0])
    out += b"\xff\xc0" + sof
    out += b"\xff\xc4" + _dht_segment(0, 0, *_STD_DC_LUMA)
    out += b"\xff\xc4" + _dht_segment(1, 0, *_STD_AC_LUMA)
    if not gray:
        out += b"\xff\xc4" + _dht_segment(0, 1, *_STD_DC_CHROMA)
        out += b"\xff\xc4" + _dht_segment(1, 1, *_STD_AC_CHROMA)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + sos

    dc_l = _build_huffman_encode(*_STD_DC_LUMA)
    ac_l = _build_huffman_encode(*_STD_AC_LUMA)
    dc_c = _build_huffman_encode(*_STD_DC_CHROMA)
    ac_c = _build_huffman_encode(*_STD_AC_CHROMA)
    writer = _BitWriter()
    preds = [[0] for _ in range(ncomp)]
    if not subsample:
        by, bx = -(-h // 8), -(-w // 8)
        for my in range(by):
            for mx in range(bx):
                for ci, plane in enumerate(planes):
                    dc_e, ac_e = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    _encode_block(
                        writer, _pad_block(plane, my * 8, mx * 8),
                        quant, preds[ci], dc_e, ac_e,
                    )
    else:
        # 4:2:0 MCU = 16x16 px: 4 Y blocks (2x2) then 1 Cb, 1 Cr
        mcus_y, mcus_x = -(-h // 16), -(-w // 16)
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by_ in range(2):
                    for bx_ in range(2):
                        _encode_block(
                            writer,
                            _pad_block(
                                planes[0], (my * 2 + by_) * 8, (mx * 2 + bx_) * 8
                            ),
                            quant, preds[0], dc_l, ac_l,
                        )
                for ci in (1, 2):
                    _encode_block(
                        writer, _pad_block(planes[ci], my * 8, mx * 8),
                        quant, preds[ci], dc_c, ac_c,
                    )
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
