"""Pure-numpy baseline JPEG codec (no PIL/opencv in the container).

Decoder: baseline sequential DCT (SOF0), 8-bit samples, grayscale or
interleaved color with any sampling factors up to 2x2 (4:4:4, 4:2:2,
4:2:0), multiple DQT/DHT segments, 8- and 16-bit quant tables, restart
markers, 0xFF00 byte stuffing — AND progressive DCT (SOF2) with both
spectral selection and successive approximation (DC first/refine,
AC first with EOB runs, AC refinement).  Arithmetic coding, hierarchical
(SOF3+) and 12-bit precision raise NotImplementedError — that boundary is
honest, not a stub.

Encoder: grayscale or 4:4:4 color, standard Annex-K Huffman tables,
caller-supplied quantization tables; encode_jpeg_progressive emits a
five-stage SOF2 scan script exercising every progressive decode path.
Progressive and baseline pipelines share only the DCT/quant front end,
so their byte-identical decoded output cross-validates both entropy
layers (pinned in tests).

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
    progressive = False
    prog_state = None  # per-component zigzag coefficient grids
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
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
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tdta >> 4, tdta & 0x0F)
                scan_comps.append(cs)
            scan_start = i + seg_len
            if not progressive:
                return _decode_scan(
                    data, scan_start, frame, scan_tables, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if prog_state is None:
                prog_state = _prog_init(frame)
            i = _decode_progressive_scan(
                data, scan_start, frame, prog_state, scan_comps, scan_tables,
                huff_dc, huff_ac, ss, se, ah, al, restart_interval,
            )
            continue
        # APPn / COM / others: skip
        i += seg_len
    if progressive and prog_state is not None:
        return _reconstruct_progressive(frame, prog_state, qt)
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


# --------------------------------------------------------------------------
# progressive JPEG (SOF2): spectral selection + successive approximation.
# Scans accumulate into per-component zigzag coefficient grids; the IDCT
# runs once at EOI.  Algorithm structure follows ITU T.81 §G (the same
# control flow every production decoder implements).
# --------------------------------------------------------------------------


def _scan_entropy_segments(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes split at RST markers (0xFF00 stuffing removed);
    returns (segments, position of the terminating marker's 0xFF)."""
    segments: list[bytearray] = [bytearray()]
    j = pos
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
            return [bytes(s) for s in segments], j
        segments[-1].append(b)
        j += 1
    return [bytes(s) for s in segments], j


def _prog_init(frame) -> dict:
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    coefs = {}
    nblocks = {}
    for cid, hs, vs, _tq in comps:
        # padded grid (interleaved DC scans cover the MCU padding blocks);
        # non-interleaved AC scans touch only the real ceil(dim/8) prefix
        coefs[cid] = np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int64)
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        nblocks[cid] = (-(-ch // 8), -(-cw // 8))  # (bh, bw)
    return {
        "coefs": coefs,
        "nblocks": nblocks,
        "mcus": (mcus_y, mcus_x),
        "hvmax": (hmax, vmax),
    }


def _decode_progressive_scan(
    data, pos, frame, state, scan_comps, scan_tables, huff_dc, huff_ac,
    ss, se, ah, al, restart_interval,
) -> int:
    """One progressive SOS; mutates state['coefs'], returns the position of
    the marker that terminated the entropy stream."""
    h, w, comps = frame
    by_cid = {c[0]: c for c in comps}
    segments, end_pos = _scan_entropy_segments(data, pos)
    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {cid: 0 for cid in scan_comps}
    eob = [0]  # EOB run shared across blocks within a restart segment

    def maybe_restart(unit_count: int) -> None:
        nonlocal reader, seg_idx, pred
        if restart_interval and unit_count and unit_count % restart_interval == 0:
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid in scan_comps}
            eob[0] = 0

    if ss == 0:  # DC scan (se must be 0); may be interleaved
        if se != 0:
            raise ValueError("progressive DC scan requires Se=0")
        mcus_y, mcus_x = state["mcus"]
        unit = 0
        if len(scan_comps) > 1:
            order = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
            for my, mx in order:
                maybe_restart(unit)
                for cs in scan_comps:
                    _cid, hs, vs, _tq = by_cid[cs]
                    for by in range(vs):
                        for bx in range(hs):
                            _dc_unit(
                                reader, state["coefs"][cs],
                                my * vs + by, mx * hs + bx,
                                huff_dc.get(scan_tables[cs][0]), pred, cs,
                                ah, al,
                            )
                unit += 1
        else:
            cs = scan_comps[0]
            bh, bw = state["nblocks"][cs]
            for yb in range(bh):
                for xb in range(bw):
                    maybe_restart(unit)
                    _dc_unit(
                        reader, state["coefs"][cs], yb, xb,
                        huff_dc.get(scan_tables[cs][0]), pred, cs, ah, al,
                    )
                    unit += 1
    else:  # AC scan: single component, non-interleaved (T.81 G.1.1.1.1)
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        cs = scan_comps[0]
        table = huff_ac[scan_tables[cs][1]]
        grid = state["coefs"][cs]
        bh, bw = state["nblocks"][cs]
        unit = 0
        for yb in range(bh):
            for xb in range(bw):
                maybe_restart(unit)
                block = grid[yb, xb]
                if ah == 0:
                    _ac_first(reader, block, table, ss, se, al, eob)
                else:
                    _ac_refine(reader, block, table, ss, se, al, eob)
                unit += 1
    return end_pos


def _dc_unit(reader, grid, yb, xb, dc_table, pred, cid, ah, al) -> None:
    if ah == 0:  # first pass: Huffman diff, shifted up by Al
        t = reader.decode_symbol(dc_table)
        diff = _extend(reader.read_bits(t), t)
        pred[cid] += diff
        grid[yb, xb, 0] = pred[cid] << al
    else:  # refinement: one bit
        if reader.read_bit():
            grid[yb, xb, 0] |= 1 << al


def _ac_first(reader, block, table, ss, se, al, eob) -> None:
    if eob[0] > 0:
        eob[0] -= 1
        return
    k = ss
    while k <= se:
        rs = reader.decode_symbol(table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eob[0] = (1 << r) - 1
            if r:
                eob[0] += reader.read_bits(r)
            return
        k += r
        if k > se:
            raise ValueError("AC run past end of spectral band")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1


def _ac_refine(reader, block, table, ss, se, al, eob) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3): newly
    nonzero coefficients arrive as ±1<<Al; already-nonzero ones receive
    one correction bit each as the scan passes over them."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eob[0] == 0:
        while k <= se:
            rs = reader.decode_symbol(table)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eob[0] = 1 << r
                    if r:
                        eob[0] += reader.read_bits(r)
                    break
                val = 0  # ZRL in refinement: 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("AC refinement magnitude must be 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = block[k]
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        block[k] += p1 if c >= 0 else m1
                else:
                    if r == 0:
                        if val:
                            block[k] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eob[0] > 0:
        while k <= se:
            c = block[k]
            if c != 0:
                if reader.read_bit() and (c & p1) == 0:
                    block[k] += p1 if c >= 0 else m1
            k += 1
        eob[0] -= 1


def _reconstruct_progressive(frame, state, qt) -> np.ndarray:
    h, w, comps = frame
    hmax, vmax = state["hvmax"]
    out = []
    for cid, hs, vs, tq in comps:
        grid = state["coefs"][cid]
        gb_y, gb_x, _ = grid.shape
        plane = np.zeros((gb_y * 8, gb_x * 8), dtype=np.float64)
        quant = qt[tq]
        for yb in range(gb_y):
            for xb in range(gb_x):
                dq = (grid[yb, xb] * quant).astype(np.float64)
                blk = np.zeros((8, 8))
                blk.flat[ZIGZAG] = dq
                plane[yb * 8 : yb * 8 + 8, xb * 8 : xb * 8 + 8] = (
                    _A.T @ blk @ _A + 128.0
                )
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        out.append(plane[:h, :w])
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


# --------------------------------------------------------------------------
# progressive encoder: DC first+refine (successive approximation) and AC
# spectral-selection scans with successive approximation on the low band.
# Exists to plant real SOF2 bytes exercising every decoder scan kind.
# --------------------------------------------------------------------------


# Custom AC Huffman table for progressive scans: the baseline Annex-K
# tables carry only EOB0 (0x00) and ZRL (0xF0) among the s=0 symbols, but
# progressive EOB runs need EOBn (0x10..0xE0).  All 176 possible (run,s)
# symbols at a flat 9-bit code length — canonical, decodable from the DHT
# segment like any other table (progressive encoders always ship custom
# tables; this one trades compression for total coverage).
_PROG_AC_TABLE = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [(run << 4) | mag for run in range(16) for mag in range(11)],
)


class _ProgAcState:
    """Per-scan AC encoder state: pending EOB run + buffered correction
    bits (refinement), flushed before the next non-EOB symbol."""

    def __init__(self, writer, enc):
        self.writer = writer
        self.enc = enc
        self.eobrun = 0
        self.pending_bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            ln, code = self.enc[r << 4]
            self.writer.write(code, ln)
            if r:
                self.writer.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.writer.write(b, 1)
        self.pending_bits = []


def _quantized_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for yb in range(bh):
        for xb in range(bw):
            blk = _pad_block(plane, yb * 8, xb * 8)
            F_ = _A @ (blk - 128.0) @ _A.T
            out[yb, xb] = np.round(F_.flat[ZIGZAG] / quant).astype(np.int64)
    return out


def _pt(v: int, al: int) -> int:
    """AC point transform: v / 2^Al rounded toward zero (T.81 G.1.2.1)."""
    return -((-v) >> al) if v < 0 else v >> al


def _encode_ac_first(writer, enc, blocks, ss, se, al) -> None:
    st = _ProgAcState(writer, enc)
    bh, bw, _ = blocks.shape
    for yb in range(bh):
        for xb in range(bw):
            band = [_pt(int(v), al) for v in blocks[yb, xb, ss : se + 1]]
            if not any(band):
                st.eobrun += 1
                if st.eobrun == 0x7FFF:
                    st.flush_eobrun()
                continue
            st.flush_eobrun()
            run = 0
            last_nz = max(i for i, v in enumerate(band) if v)
            for i in range(last_nz + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = enc[0xF0]
                    writer.write(code, ln)
                    run -= 16
                s = _category(v)
                ln, code = enc[(run << 4) | s]
                writer.write(code, ln)
                writer.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < len(band) - 1:
                st.eobrun += 1
    st.flush_eobrun()


def _encode_ac_refine(writer, enc, blocks, ss, se, ah, al) -> None:
    """T.81 G.1.2.3 refinement encoding (libjpeg encode_mcu_AC_refine
    control flow): newly nonzero coefficients (|v|>>Al == 1) emit
    run/sign symbols; already-nonzero ones append correction bits."""
    st = _ProgAcState(writer, enc)
    bh, bw, _ = blocks.shape
    for yb in range(bh):
        for xb in range(bw):
            band = [int(v) for v in blocks[yb, xb, ss : se + 1]]
            absv = [abs(_pt(v, al)) for v in band]
            run = 0
            bits: list[int] = []  # correction bits buffered per block
            for i, v in enumerate(band):
                a = absv[i]
                if a == 0:
                    run += 1
                    continue
                if a > 1:  # already nonzero at the prior stage: one
                    # correction bit, attached to whatever symbol (run/
                    # sign, ZRL, or this block's EOB-run entry) comes next
                    bits.append((abs(v) >> al) & 1)
                    continue
                # newly nonzero (a == 1)
                while run > 15:
                    st.flush_eobrun()
                    ln, code = enc[0xF0]
                    writer.write(code, ln)
                    run -= 16
                    for b in bits:
                        writer.write(b, 1)
                    bits = []
                st.flush_eobrun()
                ln, code = enc[(run << 4) | 1]
                writer.write(code, ln)
                writer.write(1 if v >= 0 else 0, 1)
                for b in bits:
                    writer.write(b, 1)
                bits = []
                run = 0
            if run > 0 or bits:
                st.eobrun += 1
                st.pending_bits.extend(bits)
                if st.eobrun == 0x7FFF:
                    st.flush_eobrun()
    st.flush_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray, quant: np.ndarray = Q_NEAR_LOSSLESS
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB, 4:4:4) uint8 -> progressive JPEG
    (SOF2).  Scan script exercises every progressive decode path: DC
    first at Al=1 + DC refinement, AC 1..5 first at Al=1 + AC refinement
    (successive approximation), AC 6..63 first at Al=0 (spectral
    selection with EOB runs)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if gray:
        planes = [pixels.astype(np.float64)]
    else:
        p = pixels.astype(np.float64)
        r, g, b = p[..., 0], p[..., 1], p[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [np.clip(np.round(c), 0, 255) for c in (y, cb, cr)]
    ncomp = len(planes)
    blocks = [_quantized_blocks(pl, quant) for pl in planes]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _dqt_segment(0, quant)
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += b"\xff\xc2" + sof
    out += b"\xff\xc4" + _dht_segment(0, 0, *_STD_DC_LUMA)
    out += b"\xff\xc4" + _dht_segment(1, 0, *_PROG_AC_TABLE)

    dc_enc = _build_huffman_encode(*_STD_DC_LUMA)
    ac_enc = _build_huffman_encode(*_PROG_AC_TABLE)

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # scan 1: DC first, all components interleaved, Al=1
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 0, 1)
    writer = _BitWriter()
    preds = {c: 0 for c in range(ncomp)}
    bh, bw, _ = blocks[0].shape
    for yb in range(bh):
        for xb in range(bw):
            for c in range(ncomp):
                dc = int(blocks[c][yb, xb, 0]) >> 1  # point transform
                diff = dc - preds[c]
                preds[c] = dc
                t = _category(diff)
                ln, code = dc_enc[t]
                writer.write(code, ln)
                if t:
                    writer.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    out += writer.flush()

    # scan 2: DC refinement, Al=0 (one bit per block per component)
    out += sos_header(list(range(1, ncomp + 1)), 0, 0, 1, 0)
    writer = _BitWriter()
    for yb in range(bh):
        for xb in range(bw):
            for c in range(ncomp):
                writer.write(int(blocks[c][yb, xb, 0]) & 1, 1)
    out += writer.flush()

    for c in range(ncomp):
        # scan 3c: AC 1..5 first at Al=1
        out += sos_header([c + 1], 1, 5, 0, 1)
        writer = _BitWriter()
        _encode_ac_first(writer, ac_enc, blocks[c], 1, 5, 1)
        out += writer.flush()
        # scan 4c: AC 1..5 refinement (Ah=1, Al=0)
        out += sos_header([c + 1], 1, 5, 1, 0)
        writer = _BitWriter()
        _encode_ac_refine(writer, ac_enc, blocks[c], 1, 5, 1, 0)
        out += writer.flush()
        # scan 5c: AC 6..63 first at Al=0 (pure spectral selection)
        out += sos_header([c + 1], 6, 63, 0, 0)
        writer = _BitWriter()
        _encode_ac_first(writer, ac_enc, blocks[c], 6, 63, 0)
        out += writer.flush()

    out += b"\xff\xd9"
    return bytes(out)
