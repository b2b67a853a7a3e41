"""Portable Roaring bitmap codec + Delta deletion-vector file layout.

Pure-python implementation of the PUBLIC formats a Delta Lake deletion-
vector reader needs (delta-io/delta PROTOCOL.md "Deletion Vectors" +
RoaringBitmap/RoaringFormatSpec):

- 32-bit Roaring portable serialization: cookie 12346 (no run containers)
  or 12347 (with run-container bitset), descriptive headers (key,
  cardinality-1), optional offset header, then array (sorted u16),
  bitmap (8 KiB bitset) and run ((start, len-1) pairs) containers.
  The DECODER handles all three container types; the ENCODER emits the
  always-legal 12346 form with array/bitmap containers chosen by the
  4096-cardinality rule.
- RoaringBitmapArray ("portable" flavour used by Delta): magic 1681511377
  (u32 LE) + number of 32-bit bitmaps (u64 LE) + each bitmap in portable
  form, bitmap i covering values [i * 2^32, (i+1) * 2^32).
- Deletion-vector blob framing inside a DV file: version byte 1 at file
  start; each blob is [dataSize u32 BE][data][CRC32(data) u32 BE], with
  the descriptor offset pointing at the dataSize field.
- z85 (ZeroMQ base85) for inline DVs and UUID path suffixes.

Everything here is bounded by deletion-vector cardinality, never by table
size; executor-side decode wiring lives in catalog/delta_native.py.
"""

from __future__ import annotations

import struct
import zlib

_MAGIC = 1681511377  # RoaringBitmapArray portable magic (delta-io)
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4

# ---------------------------------------------------------------------------
# 32-bit portable roaring
# ---------------------------------------------------------------------------


def roaring32_encode(values) -> bytes:
    """Serialize a set/iterable of uint32 values (portable, cookie 12346)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        if not 0 <= v < (1 << 32):
            raise ValueError(f"value {v} outside uint32")
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    bodies: list[bytes] = []
    for k in keys:
        lows = sorted(set(containers[k]))
        containers[k] = lows
        if len(lows) <= 4096:
            bodies.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            bodies.append(bytes(bits))
    out = bytearray()
    out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present for cookie 12346)
    pos = len(out) + 4 * len(keys)
    for body in bodies:
        out += struct.pack("<I", pos)
        pos += len(body)
    for body in bodies:
        out += body
    return bytes(out)


def roaring32_decode(buf: bytes, base: int = 0) -> list[int]:
    """Decode one portable 32-bit roaring bitmap starting at ``base``;
    returns (sorted values, next offset) — see _decode_at."""
    values, _ = _decode_at(buf, base)
    return values


def _decode_at(buf: bytes, pos: int) -> tuple[list[int], int]:
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_bits = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nrb = (n + 7) // 8
        run_bits = buf[pos : pos + nrb]
        pos += nrb
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential decode
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        hi = key << 16
        is_run = bool(run_bits) and bool(run_bits[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(hi | v for v in range(start, start + length_m1 + 1))
        elif card <= 4096:
            lows = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(hi | lo for lo in lows)
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, b in enumerate(bits):
                while b:
                    lsb = b & -b
                    values.append(hi | (byte_i << 3) | lsb.bit_length() - 1)
                    b ^= lsb
    return values, pos


# ---------------------------------------------------------------------------
# RoaringBitmapArray (64-bit values as an array of 32-bit bitmaps)
# ---------------------------------------------------------------------------


def bitmap_array_encode(values) -> bytes:
    by_hi: dict[int, list[int]] = {}
    mx = -1
    for v in values:
        if v < 0:
            raise ValueError("negative row index")
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
        mx = max(mx, v >> 32)
    out = bytearray(struct.pack("<IQ", _MAGIC, mx + 1))
    # delta's format is a dense prefix array: bitmap i covers
    # [i * 2^32, (i+1) * 2^32), empty bitmaps included
    for hi in range(mx + 1):
        out += roaring32_encode(by_hi.get(hi, []))
    return bytes(out)


def bitmap_array_decode(buf: bytes) -> list[int]:
    magic, n = struct.unpack_from("<IQ", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    values: list[int] = []
    for hi in range(n):
        vals, pos = _decode_at(buf, pos)
        values.extend((hi << 32) | v for v in vals)
    return values


# ---------------------------------------------------------------------------
# deletion-vector blob framing + z85
# ---------------------------------------------------------------------------


def dv_blob(values) -> bytes:
    """[dataSize u32 BE][RoaringBitmapArray][CRC32 u32 BE] for one DV."""
    data = bitmap_array_encode(values)
    return struct.pack(">I", len(data)) + data + struct.pack(
        ">I", zlib.crc32(data) & 0xFFFFFFFF
    )


def dv_read_blob(buf: bytes, offset: int) -> list[int]:
    """Decode the DV blob whose descriptor offset is ``offset``."""
    (size,) = struct.unpack_from(">I", buf, offset)
    data = buf[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", buf, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("deletion-vector CRC mismatch")
    return bitmap_array_decode(data)


_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[word % 85])
            word //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for ch in text[i : i + 5]:
            word = word * 85 + _Z85_INV[ch]
        out += struct.pack(">I", word)
    return bytes(out)
