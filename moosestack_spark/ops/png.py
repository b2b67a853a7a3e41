"""Pure-numpy + stdlib-zlib PNG codec.

PNG's compression is DEFLATE, which the stdlib `zlib` module implements —
so unlike JPEG there is no entropy-coding work to do by hand.  What remains
is the container walk (IHDR/PLTE/tRNS/IDAT/IEND chunks + CRC), scanline
unfiltering (the five filters of RFC 2083 §6), bit-depth unpacking and
color-type normalization, all vectorizable except the unfilter scan (Paeth
has a row-serial dependency, done row-by-row with vectorized columns).

Decoder coverage: 8-bit and 16-bit grayscale / RGB / palette / gray+alpha /
RGBA, bit depths 1/2/4/8/16 for grayscale and palette, all five scanline
filters, sequential AND Adam7-interlaced layouts (each of the seven
interlace passes is an independently-filtered sub-image whose pixels land
at the standard (x0, y0, dx, dy) offsets).

Encoder: 8-bit RGB / grayscale, filter 0, one IDAT, sequential or Adam7
(interlace=True) — plants real bytes for tests and the oracle-gated query.
PNG is lossless, so unlike the JPEG gate no quant-table trick is needed:
ANY planted content decodes bit-exactly and the oracle replays the
generator arithmetic directly.

Used by ops/multimodal.decode_image via payload sniffing (\\x89PNG magic).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# bytes per pixel (pre-bit-depth) per color type: gray, rgb, palette, GA, RGBA
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step), PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 RGB (16-bit samples scaled down; alpha dropped
    after compositing over white, matching common training-pipeline
    normalization)."""
    if data[: len(PNG_MAGIC)] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = len(PNG_MAGIC)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos < len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, bit_depth, color_type, compression, filt, interlace = ihdr
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    if compression != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid color type {color_type}")
    if color_type in (2, 4, 6) and bit_depth not in (8, 16):
        raise ValueError("RGB/alpha images require bit depth 8 or 16")

    channels = _CHANNELS[color_type]
    bits_per_px = channels * bit_depth
    bpp = max(1, bits_per_px // 8)  # filter unit
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        row_bytes = (w * bits_per_px + 7) // 8
        expected = (row_bytes + 1) * h
        if len(raw) < expected:
            raise ValueError("truncated IDAT stream")
        rows = np.frombuffer(raw, np.uint8, expected).reshape(h, row_bytes + 1)
        out = _unfilter(rows, bpp, row_bytes)
        px = _samples(out, w, h, bit_depth, color_type)
        return _colorize(px, color_type, palette)

    # Adam7: seven independently-filtered sub-images, each placed at its
    # pass offsets/strides into the full-size sample grid
    full = np.zeros((h, w, channels), dtype=np.uint8)
    pos2 = 0
    for x0, y0, dx, dy in _ADAM7:
        w_p = (w - x0 + dx - 1) // dx if w > x0 else 0
        h_p = (h - y0 + dy - 1) // dy if h > y0 else 0
        if w_p <= 0 or h_p <= 0:
            continue
        rb = (w_p * bits_per_px + 7) // 8
        need = (rb + 1) * h_p
        if len(raw) < pos2 + need:
            raise ValueError("truncated IDAT stream")
        rows = np.frombuffer(raw, np.uint8, need, offset=pos2).reshape(
            h_p, rb + 1
        )
        pos2 += need
        out = _unfilter(rows, bpp, rb)
        full[y0::dy, x0::dx] = _samples(out, w_p, h_p, bit_depth, color_type)
    return _colorize(full, color_type, palette)


def _unfilter(rows: np.ndarray, bpp: int, row_bytes: int) -> np.ndarray:
    """(h, row_bytes+1) filter-prefixed scanlines -> (h, row_bytes)
    unfiltered bytes (RFC 2083 §6; row-serial, vectorized columns)."""
    h = rows.shape[0]
    filters = rows[:, 0]
    cur = rows[:, 1:].astype(np.int64)
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    for y in range(h):
        line = cur[y].copy()
        f = filters[y]
        prior = out[y - 1].astype(np.int64) if y else np.zeros(row_bytes, np.int64)
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, row_bytes):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            line = (line + prior) & 0xFF
        elif f == 3:  # Average
            for x in range(row_bytes):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(row_bytes):
                a = line[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter {f}")
        out[y] = line.astype(np.uint8)
    return out


def _samples(out: np.ndarray, w: int, h: int, bit_depth: int, color_type: int) -> np.ndarray:
    """Unfiltered scanline bytes -> (h, w, channels) uint8 samples
    (16-bit scaled down, sub-byte depths unpacked; palette indexes kept
    raw for _colorize)."""
    channels = _CHANNELS[color_type]
    if bit_depth == 16:
        px = out.reshape(h, -1).view(">u2").astype(np.uint16).reshape(h, w, channels)
        return (px >> 8).astype(np.uint8)  # scale to 8-bit
    if bit_depth == 8:
        return out.reshape(h, -1)[:, : w * channels].reshape(h, w, channels)
    # 1/2/4-bit gray or palette: unpack bit groups
    bits = np.unpackbits(out, axis=1)
    per = bit_depth
    groups = bits[:, : w * per].reshape(h, w, per)
    weights = (1 << np.arange(per - 1, -1, -1)).astype(np.uint16)
    vals = (groups * weights).sum(axis=2).astype(np.uint8)
    if color_type == 0:  # scale to full 8-bit range
        vals = (vals * (255 // ((1 << per) - 1))).astype(np.uint8)
    return vals[..., None]


def _colorize(px: np.ndarray, color_type: int, palette) -> np.ndarray:
    """(h, w, channels) samples -> HxWx3 uint8 RGB."""
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE chunk")
        return palette[px[..., 0]]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 2:
        return px
    if color_type == 4:  # gray + alpha: composite over white
        g = px[..., 0].astype(np.int64)
        a = px[..., 1].astype(np.int64)
        comp = ((g * a + 255 * (255 - a) + 127) // 255).astype(np.uint8)
        return np.repeat(comp[..., None], 3, axis=2)
    # RGBA: composite over white
    rgb = px[..., :3].astype(np.int64)
    a = px[..., 3:4].astype(np.int64)
    return (((rgb * a) + 255 * (255 - a) + 127) // 255).astype(np.uint8)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6, interlace: bool = False) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> PNG (filter 0, one IDAT).
    ``interlace=True`` writes the Adam7 layout (each pass a filter-0
    sub-image in pass order) — used to plant real interlaced test/corpus
    bytes."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    color_type = 0 if gray else 2
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1 if interlace else 0)
    px = pixels.reshape(h, w, -1).astype(np.uint8)
    if not interlace:
        flat = px.reshape(h, -1)
        scan = np.concatenate([np.zeros((h, 1), np.uint8), flat], axis=1)
        body = scan.tobytes()
    else:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            h_p = sub.shape[0]
            flat = sub.reshape(h_p, -1)
            scan = np.concatenate([np.zeros((h_p, 1), np.uint8), flat], axis=1)
            parts.append(scan.tobytes())
        body = b"".join(parts)
    idat = zlib.compress(body, level)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
