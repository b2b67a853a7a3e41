"""Pure-python FLAC codec (no libFLAC in the container).

Decoder: STREAMINFO metadata walk, frame sync + header (UTF-8 frame
numbers, all block-size/sample-rate encodings, CRC-8 header check),
subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32) with wasted
bits, Rice residual partitions (methods 0 and 4/5-bit params, escape
codes), channel decorrelation (independent, left/side, right/side,
mid/side), CRC-16 frame check.  16-bit output; other depths decode and
scale.  That is the complete lossless layer of the format; Ogg-FLAC
encapsulation is handled by ops/ogg.py (page walk + mapping header).

Encoder: 16-bit mono/stereo with CONSTANT / VERBATIM / FIXED(0-2) / a
fixed-coefficient LPC mode and single-partition Rice residuals — plants
real frames exercising every decoder path; lossless round-trip equality
is the test oracle (like PNG, any planted content must come back
bit-exact).

Used by ops/multimodal.decode_audio-style pipelines via payload sniffing
("fLaC" magic).
"""

from __future__ import annotations

import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader with byte-position tracking (CRC spans)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            v = (v << 1) | ((self.data[self.pos] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _read_utf8_number(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n - 1):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


def _rice_residual(bits: _Bits, n: int, predictor_order: int) -> np.ndarray:
    """Residual section: partitioned Rice (methods 0: 4-bit, 1: 5-bit)."""
    method = bits.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    out = np.empty(n - predictor_order, dtype=np.int64)
    idx = 0
    for p in range(nparts):
        count = (n >> porder) - (predictor_order if p == 0 else 0)
        param = bits.read(plen)
        if param == escape:  # raw residuals at explicit bit width
            width = bits.read(5)
            for _ in range(count):
                out[idx] = bits.read_signed(width) if width else 0
                idx += 1
        else:
            for _ in range(count):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                z = (q << param) | r
                out[idx] = (z >> 1) ^ -(z & 1)  # zigzag -> signed
                idx += 1
    return out


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> np.ndarray:
    if bits.read(1) != 0:
        raise ValueError("invalid subframe sync bit")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):  # wasted bits flag: unary count - 1
        wasted = bits.read_unary() + 1
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(bps)
        out = np.full(block_size, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array(
            [bits.read_signed(bps) for _ in range(block_size)], dtype=np.int64
        )
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [bits.read_signed(bps) for _ in range(order)]
        resid = _rice_residual(bits, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        coeffs = _FIXED_COEFFS[order]
        for i in range(order, block_size):
            pred = sum(c * out[i - 1 - j] for j, c in enumerate(coeffs))
            out[i] = resid[i - order] + pred
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(bps) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid LPC precision")
        shift = bits.read_signed(5)
        coeffs = [bits.read_signed(prec) for _ in range(order)]
        resid = _rice_residual(bits, block_size, order)
        out = np.empty(block_size, dtype=np.int64)
        out[:order] = warm
        for i in range(order, block_size):
            acc = sum(c * int(out[i - 1 - j]) for j, c in enumerate(coeffs))
            out[i] = resid[i - order] + (acc >> shift)
    else:
        raise ValueError(f"reserved subframe type {stype}")
    return out << wasted


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_RATE_TABLE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes -> (samples int32 array of shape (n, channels), rate)."""
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] >> 7
        btype = hdr[0] & 0x7F
        length = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            bits = _Bits(body)
            bits.read(16)  # min block
            bits.read(16)  # max block
            bits.read(24)  # min frame
            bits.read(24)  # max frame
            rate = bits.read(20)
            channels = bits.read(3) + 1
            bps = bits.read(5) + 1
            total = bits.read(36)
            streaminfo = (rate, channels, bps, total)
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("missing STREAMINFO")
    rate, channels, bps, total = streaminfo

    chunks = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame, pos = _decode_frame(data, pos, channels, bps)
        chunks.append(frame)
        got += frame.shape[0]
    out = np.concatenate(chunks, axis=0) if chunks else np.zeros((0, channels), np.int64)
    if total:
        out = out[:total]
    return out.astype(np.int32), rate


def _decode_frame(data: bytes, pos: int, channels: int, bps: int):
    start = pos
    bits = _Bits(data, pos)
    sync = bits.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"bad frame sync at byte {pos}")
    bits.read(1)  # reserved
    bits.read(1)  # blocking strategy
    bs_code = bits.read(4)
    sr_code = bits.read(4)
    ch_code = bits.read(4)
    bps_code = bits.read(3)
    bits.read(1)  # reserved
    _read_utf8_number(bits)  # frame/sample number
    if bs_code == 6:
        block_size = bits.read(8) + 1
    elif bs_code == 7:
        block_size = bits.read(16) + 1
    else:
        block_size = _BLOCKSIZE_TABLE[bs_code]
    if sr_code == 12:
        bits.read(8)
    elif sr_code in (13, 14):
        bits.read(16)
    if bps_code:
        bps = _BPS_TABLE[bps_code]
    hdr_end = bits.pos + (1 if bits.bit else 0)
    crc8 = bits.read(8)
    if _crc8(data[start : hdr_end]) != crc8:
        raise ValueError("frame header CRC-8 mismatch")

    if ch_code < 8:
        nch = ch_code + 1
        if nch != channels:
            raise ValueError("frame channel count != STREAMINFO")
        subs = [
            _decode_subframe(bits, block_size, bps) for _ in range(nch)
        ]
        frame = np.stack(subs, axis=1)
    elif ch_code == 8:  # left/side
        left = _decode_subframe(bits, block_size, bps)
        side = _decode_subframe(bits, block_size, bps + 1)
        frame = np.stack([left, left - side], axis=1)
    elif ch_code == 9:  # right/side
        side = _decode_subframe(bits, block_size, bps + 1)
        right = _decode_subframe(bits, block_size, bps)
        frame = np.stack([right + side, right], axis=1)
    elif ch_code == 10:  # mid/side
        mid = _decode_subframe(bits, block_size, bps)
        side = _decode_subframe(bits, block_size, bps + 1)
        left = ((mid << 1) | (side & 1)) + side
        frame = np.stack([left >> 1, (left >> 1) - side], axis=1)
    else:
        raise ValueError(f"reserved channel assignment {ch_code}")

    bits.align()
    frame_end = bits.pos
    crc16 = (data[frame_end] << 8) | data[frame_end + 1]
    if _crc16(data[start:frame_end]) != crc16:
        raise ValueError("frame CRC-16 mismatch")
    return frame, frame_end + 2


# --------------------------------------------------------------------------
# encoder: 16-bit, CONSTANT / VERBATIM / FIXED(0-2) / fixed-coefficient LPC,
# single-partition Rice — plants real frames for every decoder path.
# --------------------------------------------------------------------------


class _BitsW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, n: int) -> None:
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)

    def bytes(self) -> bytes:
        return bytes(self.out)


def _rice_write(w: _BitsW, resid: np.ndarray, plen: int = 4) -> None:
    """Single-partition Rice with a brute-force best parameter."""
    z = np.where(resid >= 0, resid * 2, -resid * 2 - 1).astype(np.int64)
    escape = (1 << plen) - 1
    best, best_cost = 0, None
    for param in range(escape):
        cost = int((z >> param).sum()) + (1 + param) * len(z)
        if best_cost is None or cost < best_cost:
            best, best_cost = param, cost
    w.write(0 if plen == 4 else 1, 2)
    w.write(0, 4)  # partition order 0
    w.write(best, plen)
    for v in z:
        v = int(v)
        w.write_unary(v >> best)
        if best:
            w.write(v & ((1 << best) - 1), best)


def _encode_subframe(w: _BitsW, samples: np.ndarray, mode: str, bps: int = 16) -> None:
    s = samples.astype(np.int64)
    # prediction order must not exceed the block length (a final short
    # block can be smaller than the requested order): fall back to
    # verbatim, the spec-valid encoding for any block size
    if mode.startswith("fixed") and int(mode[-1]) >= len(s):
        mode = "verbatim"
    if mode == "lpc2" and len(s) <= 2:
        mode = "verbatim"
    if mode == "constant":
        w.write(0, 1); w.write(0, 6); w.write(0, 1)
        w.write_signed(int(s[0]), bps)
        return
    if mode == "verbatim":
        w.write(0, 1); w.write(1, 6); w.write(0, 1)
        for v in s:
            w.write_signed(int(v), bps)
        return
    if mode.startswith("fixed"):
        order = int(mode[-1])
        w.write(0, 1); w.write(8 + order, 6); w.write(0, 1)
        for v in s[:order]:
            w.write_signed(int(v), bps)
        coeffs = _FIXED_COEFFS[order]
        resid = np.array(
            [
                int(s[i]) - sum(c * int(s[i - 1 - j]) for j, c in enumerate(coeffs))
                for i in range(order, len(s))
            ],
            dtype=np.int64,
        )
        _rice_write(w, resid, plen=4)
        return
    if mode == "lpc2":
        # order-2 LPC with fixed qlp coeffs [3, -1], shift 1 (≈ 1.5a-0.5b)
        order, coeffs, shift, prec = 2, [3, -1], 1, 4
        w.write(0, 1); w.write(32 + order - 1, 6); w.write(0, 1)
        for v in s[:order]:
            w.write_signed(int(v), bps)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coeffs:
            w.write_signed(c, prec)
        resid = np.array(
            [
                int(s[i])
                - ((sum(c * int(s[i - 1 - j]) for j, c in enumerate(coeffs))) >> shift)
                for i in range(order, len(s))
            ],
            dtype=np.int64,
        )
        _rice_write(w, resid, plen=5)
        return
    raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(
    samples: np.ndarray,
    rate: int = 16000,
    block_size: int = 4096,
    modes: tuple[str, ...] = ("fixed2",),
    mid_side: bool = False,
) -> bytes:
    """(n,) mono or (n, 2) stereo int16 -> FLAC bytes.  ``modes`` cycles
    per frame (exercising multiple subframe types in one stream);
    ``mid_side`` uses the mid/side channel decorrelation for stereo."""
    header, frames = encode_flac_parts(samples, rate, block_size, modes, mid_side)
    return header + b"".join(frames)


def encode_flac_parts(
    samples: np.ndarray,
    rate: int = 16000,
    block_size: int = 4096,
    modes: tuple[str, ...] = ("fixed2",),
    mid_side: bool = False,
) -> tuple[bytes, list[bytes]]:
    """Same as encode_flac but returns (magic+STREAMINFO header bytes,
    [complete frame bytes...]) — the split the Ogg-FLAC mapping needs
    (first packet carries the header, then one frame per packet)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    bps = 16

    info = _BitsW()
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n, 36)
    # 18 parameter bytes + 16-byte unset MD5 = the spec-mandated 34-byte
    # STREAMINFO body (libFLAC validates length == 34).
    body = info.bytes() + b"\x00" * 16
    header = bytes(FLAC_MAGIC) + bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frames: list[bytes] = []
    frame_no = 0
    for off in range(0, n, block_size):
        blk = s[off : off + block_size]
        bs = blk.shape[0]
        w = _BitsW()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # 16-bit blocksize-1 follows
        w.write(0, 4)  # rate from STREAMINFO
        mode = modes[frame_no % len(modes)]
        if channels == 2 and mid_side:
            w.write(10, 4)
        else:
            w.write(channels - 1, 4)
        w.write(4, 3)  # 16 bps
        w.write(0, 1)
        # UTF-8 frame number (single byte while < 128)
        if frame_no >= 128:
            raise ValueError("encoder supports < 128 frames")
        w.write(frame_no, 8)
        w.write(bs - 1, 16)
        hdr = w.bytes() if w.n == 0 else None
        assert hdr is not None, "header must be byte-aligned here"
        w.write(_crc8(hdr), 8)
        if channels == 2 and mid_side:
            left, right = blk[:, 0], blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            _encode_subframe(w, mid, mode, bps)
            _encode_subframe(w, side, mode, bps + 1)
        else:
            for c in range(channels):
                _encode_subframe(w, blk[:, c], mode, bps)
        w.align()
        frame = w.bytes()
        frames.append(frame + _crc16(frame).to_bytes(2, "big"))
        frame_no += 1
    return header, frames
