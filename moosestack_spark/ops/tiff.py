"""Pure-python baseline TIFF image codec.

Builds on the IFD machinery proven by the EXIF walker
(ops/multimodal_ext.py): this module decodes PIXELS — 8- and 16-bit
grayscale (photometric 0/1) and RGB (2), BOTH strip and TILE layouts
(edge tiles padded per spec section 15), both byte orders, with
compression 1 (none), 32773 (PackBits) and 5 (TIFF LZW: MSB-first codes
with EarlyChange, plus the horizontal-difference predictor applied per
sample at either depth), and PALETTE color (photometric 3: 4-bit packed
or 8-bit indices mapped through the 3x2^depth SHORT ColorMap).  Planar
configuration 1 (chunky) and palette-with-tiles are the remaining loud
boundaries.  decode_tiff returns the uint8 RGB contract (16-bit takes
the high byte); decode_tiff16 keeps 16-bit planes exact.

Encoders: encode_tiff (strips, 8-bit), encode_tiff_tiled (tiles,
8/16-bit) and encode_tiff_palette (strips, 4/8-bit indices + ColorMap),
little-endian, all three compressions (+ optional predictor for LZW) —
they plant real bytes so the decoder's round-trip equality is the test
oracle (TIFF is lossless).

Used by ops/multimodal.decode_image via payload sniffing (II*/MM* magic).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG = {
    "width": 256, "height": 257, "bits": 258, "compression": 259,
    "photometric": 262, "strip_offsets": 273, "spp": 277,
    "rows_per_strip": 278, "strip_counts": 279, "planar": 284,
    "predictor": 317,
    "colormap": 320,
    "tile_width": 322, "tile_length": 323, "tile_offsets": 324,
    "tile_counts": 325,
}
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _read_values(data: bytes, e: str, typ: int, cnt: int, raw_field: bytes):
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * cnt
    if total <= 4:
        buf = raw_field[:total]
    else:
        (off,) = struct.unpack(e + "I", raw_field)
        buf = data[off : off + total]
    if typ == 3:
        return list(struct.unpack(e + "H" * cnt, buf))
    if typ == 4:
        return list(struct.unpack(e + "I" * cnt, buf))
    if typ == 1:
        return list(buf)
    return None


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    return bytes(out[:expected])


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first variable-width codes, clear=256, eoi=257,
    EarlyChange (width bumps one code early)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                return bytes(out[:expected])
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # EarlyChange (TIFF spec / libtiff tif_lzw.c): the decoder
            # widens at table length 2^width - 2 — its table trails the
            # encoder's next_code by one, and the encoder widened at
            # next_code == 2^width - 1
            if len(table) >= (1 << width) - 2 and width < 12:
                width += 1
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF -> HxWx3 uint8 RGB (grayscale replicated; MinIsWhite
    inverted; 16-bit planes take the high byte — decode_tiff16 keeps
    them exact)."""
    px, depth, photometric, spp = _decode_core(data)
    if depth == 16:
        px = (px.astype(np.uint16) >> 8).astype(np.uint8)
    if spp == 1:
        g = px[..., 0]
        if photometric == 0:  # MinIsWhite
            g = (255 - g.astype(np.int64)).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    if spp < 3:
        raise NotImplementedError(f"{spp}-sample TIFF not supported")
    return np.ascontiguousarray(px[..., :3])


def decode_tiff16(data: bytes) -> np.ndarray:
    """Exact 16-bit plane (HxWxspp uint16) — the lossless round-trip
    surface for 16-bit fixtures."""
    px, depth, _, _ = _decode_core(data)
    if depth != 16:
        raise ValueError("not a 16-bit TIFF")
    return np.ascontiguousarray(px.astype(np.uint16))


def _decode_core(data: bytes) -> tuple[np.ndarray, int, int, int]:
    if data[:4] not in (b"II*\x00", b"MM\x00*"):
        raise ValueError("not a TIFF payload")
    e = "<" if data[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack_from(e + "I", data, 4)
    (n,) = struct.unpack_from(e + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, ifd_off + 2 + i * 12)
        raw_field = data[ifd_off + 2 + i * 12 + 8 : ifd_off + 2 + i * 12 + 12]
        vals = _read_values(data, e, typ, cnt, raw_field)
        if vals is not None:
            tags[tag] = vals

    def one(name, default=None):
        v = tags.get(_TAG[name])
        return v[0] if v else default

    w, h = one("width"), one("height")
    if not w or not h:
        raise ValueError("TIFF missing dimensions")
    spp = one("spp", 1)
    bits = tags.get(_TAG["bits"], [8])
    if len(set(bits)) != 1:
        raise NotImplementedError("only uniform TIFF sample depths supported")
    depth = bits[0]
    if one("planar", 1) != 1:
        raise NotImplementedError("planar TIFF not supported")
    comp = one("compression", 1)
    photometric = one("photometric", 1)
    if photometric not in (0, 1, 2, 3):
        raise NotImplementedError(f"TIFF photometric {photometric} not supported")
    palette = photometric == 3
    if palette:
        if spp != 1:
            raise ValueError("palette TIFF must be 1 sample/pixel")
        if depth not in (4, 8):
            raise NotImplementedError(
                f"{depth}-bit palette TIFF not supported (4/8 only)"
            )
        if _TAG["colormap"] not in tags:
            raise ValueError("palette TIFF missing ColorMap tag")
    elif depth not in (8, 16):
        raise NotImplementedError("only uniform 8/16-bit TIFF samples supported")
    bps = max(depth // 8, 1)  # bytes per assembled sample (4-bit handled below)
    predictor = one("predictor", 1)
    if palette and predictor == 2:
        raise NotImplementedError("horizontal predictor over palette indices")

    def decompress(seg: bytes, expected: int) -> bytes:
        if comp == 1:
            return seg[:expected]
        if comp == 32773:
            return _unpackbits(seg, expected)
        if comp == 5:
            return _lzw_decode_tiff(seg, expected)
        raise NotImplementedError(f"TIFF compression {comp} not supported")

    def undiff(arr: np.ndarray) -> np.ndarray:
        # horizontal differencing is per SAMPLE, applied after byte
        # decompression and sample assembly (TIFF spec section 14)
        if predictor == 2:
            wrap = np.uint8 if depth == 8 else np.uint16
            return np.cumsum(arr.astype(np.int64), axis=1).astype(wrap)
        return arr

    if palette:
        # Palette color (spec section 5): strip-layout indices, 4-bit
        # packed two-per-byte high-nibble-first with row byte-alignment,
        # mapped through the 3x2^depth SHORT ColorMap (high byte is the
        # 8-bit display value, the same 257-multiple convention real
        # writers use).  Reuses the GIF-path palette discipline.
        if tags.get(_TAG["tile_offsets"]):
            raise NotImplementedError("palette TIFF with tile layout")
        offsets = tags.get(_TAG["strip_offsets"])
        counts = tags.get(_TAG["strip_counts"])
        if not offsets:
            raise ValueError("TIFF has neither strip nor tile offsets")
        rows_per_strip = one("rows_per_strip", h)
        row_bytes = (w * depth + 7) // 8
        raw = bytearray()
        for si, off in enumerate(offsets):
            cnt = counts[si] if counts and si < len(counts) else len(data) - off
            rows = min(rows_per_strip, h - si * rows_per_strip)
            raw += decompress(data[off : off + cnt], rows * row_bytes)
        rowdat = np.frombuffer(bytes(raw), np.uint8, h * row_bytes).reshape(
            h, row_bytes
        )
        if depth == 4:
            idx = np.empty((h, row_bytes * 2), np.uint8)
            idx[:, 0::2] = rowdat >> 4
            idx[:, 1::2] = rowdat & 0x0F
            idx = idx[:, :w]
        else:
            idx = rowdat[:, :w]
        ncol = 1 << depth
        cmap = tags[_TAG["colormap"]]
        if len(cmap) != 3 * ncol:
            raise ValueError(
                f"ColorMap carries {len(cmap)} values, expected {3 * ncol}"
            )
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("palette index out of ColorMap range")
        lut = (np.asarray(cmap, np.uint16).reshape(3, ncol) >> 8).astype(
            np.uint8
        )
        px = np.stack([lut[0][idx], lut[1][idx], lut[2][idx]], axis=-1)
        return px, 8, 2, 3

    dt = np.dtype(("<u1" if depth == 8 else e + "u2"))
    tile_offsets = tags.get(_TAG["tile_offsets"])
    if tile_offsets:
        tw, tl = one("tile_width"), one("tile_length")
        if not tw or not tl:
            raise ValueError("tiled TIFF missing tile dimensions")
        tcounts = tags.get(_TAG["tile_counts"])
        tiles_across = (w + tw - 1) // tw
        out = np.zeros((h, w, spp), dtype=dt.newbyteorder("="))
        tile_bytes = tw * tl * spp * bps
        for ti, off in enumerate(tile_offsets):
            cnt = tcounts[ti] if tcounts and ti < len(tcounts) else len(data) - off
            raw = decompress(data[off : off + cnt], tile_bytes)
            tile = np.frombuffer(raw, dt, tw * tl * spp).reshape(tl, tw, spp)
            tile = undiff(tile)
            r0 = (ti // tiles_across) * tl
            c0 = (ti % tiles_across) * tw
            rows, cols = min(tl, h - r0), min(tw, w - c0)
            # tiles are padded to full size at the right/bottom edges
            out[r0 : r0 + rows, c0 : c0 + cols] = tile[:rows, :cols]
        px = out
    else:
        offsets = tags.get(_TAG["strip_offsets"])
        counts = tags.get(_TAG["strip_counts"])
        if not offsets:
            raise ValueError("TIFF has neither strip nor tile offsets")
        rows_per_strip = one("rows_per_strip", h)
        row_bytes = w * spp * bps
        raw = bytearray()
        for si, off in enumerate(offsets):
            cnt = counts[si] if counts and si < len(counts) else len(data) - off
            rows = min(rows_per_strip, h - si * rows_per_strip)
            raw += decompress(data[off : off + cnt], rows * row_bytes)
        px = np.frombuffer(bytes(raw), dt, h * w * spp).reshape(h, w, spp)
        px = undiff(px)
    return px, depth, photometric, spp


# --------------------------------------------------------------------------
# encoder (fixtures): little-endian, strips, none/PackBits/LZW.
# --------------------------------------------------------------------------


def _packbits(row: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and row[j + 1] == row[j])
            ):
                j += 1
            out += bytes([j - i - 1]) + row[i:j]
            i = j
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(CLEAR)
    cur = b""
    for b in data:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # EarlyChange (TIFF spec / libtiff): widen as soon as the next code
        # to be ASSIGNED is 2^width - 1
        if next_code >= (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:  # table nearly full: reset
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(EOI)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    compression: str = "none",
    rows_per_strip: int | None = None,
    predictor: bool = False,
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) uint8 -> little-endian TIFF.
    ``compression`` in {none, packbits, lzw}; ``predictor`` applies
    horizontal differencing (LZW only, as in real writers)."""
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    spp = 1 if gray else 3
    px = pixels.reshape(h, w, spp).astype(np.uint8)
    if predictor and compression != "lzw":
        raise ValueError("predictor is an LZW option")
    if predictor:
        d = px.astype(np.int64)
        px = np.concatenate([d[:, :1], np.diff(d, axis=1)], axis=1).astype(np.uint8)
    rows_per_strip = rows_per_strip or h
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]

    strips = []
    for y0 in range(0, h, rows_per_strip):
        seg = px[y0 : y0 + rows_per_strip].tobytes()
        if compression == "none":
            strips.append(seg)
        elif compression == "packbits":
            # PackBits restarts per ROW per the spec
            rb = w * spp
            strips.append(
                b"".join(
                    _packbits(seg[r : r + rb]) for r in range(0, len(seg), rb)
                )
            )
        else:
            strips.append(_lzw_encode_tiff(seg))

    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (259, 3, 1, comp_code),
        (262, 3, 1, 1 if gray else 2), (277, 3, 1, spp),
        (278, 3, 1, rows_per_strip),
    ]
    if predictor:
        entries.append((317, 3, 1, 2))
    bits_off_needed = spp > 2  # BitsPerSample array for RGB needs offset
    n_entries = len(entries) + 3  # + bits, strip_offsets, strip_counts
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4

    aux = bytearray()

    def alloc(buf: bytes) -> int:
        off = data_off + len(aux)
        aux.extend(buf)
        return off

    if bits_off_needed:
        bits_val = alloc(struct.pack("<3H", 8, 8, 8))
        entries.append((258, 3, 3, bits_val))
    else:
        entries.append((258, 3, 1, 8))
    n_strips = len(strips)
    if n_strips == 1:
        counts_field = (279, 4, 1, len(strips[0]))
    else:
        counts_field = (
            279, 4, n_strips,
            alloc(struct.pack(f"<{n_strips}I", *[len(s) for s in strips])),
        )
    # strip data allocated last so offsets are known
    offs = []
    for s in strips:
        offs.append(alloc(s))
    if n_strips == 1:
        offsets_field = (273, 4, 1, offs[0])
    else:
        off_table = alloc(struct.pack(f"<{n_strips}I", *offs))
        offsets_field = (273, 4, n_strips, off_table)
    entries += [offsets_field, counts_field]
    entries.sort()
    assert len(entries) == n_entries

    out = struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += bytes(aux)
    return out


def encode_tiff_tiled(
    pixels: np.ndarray,
    tile: tuple[int, int] = (16, 16),
    compression: str = "none",
    predictor: bool = False,
    bits: int = 8,
) -> bytes:
    """HxW (grayscale) or HxWx3 (RGB) -> little-endian TILED TIFF, 8- or
    16-bit samples.  Tiles are padded to full size at the right/bottom
    edges (spec section 15); predictor differencing runs per tile row."""
    if bits not in (8, 16):
        raise ValueError("bits must be 8 or 16")
    if predictor and compression != "lzw":
        raise ValueError("predictor is an LZW option")
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    spp = 1 if gray else 3
    dt = np.uint8 if bits == 8 else np.dtype("<u2")
    px = pixels.reshape(h, w, spp).astype(dt)
    tw, tl = tile
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]

    tiles = []
    for y0 in range(0, h, tl):
        for x0 in range(0, w, tw):
            block = np.zeros((tl, tw, spp), dtype=dt)
            sub = px[y0 : y0 + tl, x0 : x0 + tw]
            block[: sub.shape[0], : sub.shape[1]] = sub
            if predictor:
                d = block.astype(np.int64)
                block = np.concatenate(
                    [d[:, :1], np.diff(d, axis=1)], axis=1
                ).astype(dt)
            seg = block.tobytes()
            if compression == "none":
                tiles.append(seg)
            elif compression == "packbits":
                rb = tw * spp * (bits // 8)
                tiles.append(
                    b"".join(
                        _packbits(seg[r : r + rb])
                        for r in range(0, len(seg), rb)
                    )
                )
            else:
                tiles.append(_lzw_encode_tiff(seg))

    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (259, 3, 1, comp_code),
        (262, 3, 1, 1 if gray else 2), (277, 3, 1, spp),
        (322, 3, 1, tw), (323, 3, 1, tl),
    ]
    if predictor:
        entries.append((317, 3, 1, 2))
    n_entries = len(entries) + 3  # + bits, tile_offsets, tile_counts
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    aux = bytearray()

    def alloc(buf: bytes) -> int:
        off = data_off + len(aux)
        aux.extend(buf)
        return off

    if spp > 2:
        entries.append((258, 3, 3, alloc(struct.pack("<3H", bits, bits, bits))))
    else:
        entries.append((258, 3, 1, bits))
    n_tiles = len(tiles)
    if n_tiles == 1:
        counts_field = (325, 4, 1, len(tiles[0]))
    else:
        counts_field = (
            325, 4, n_tiles,
            alloc(struct.pack(f"<{n_tiles}I", *[len(s) for s in tiles])),
        )
    offs = [alloc(s) for s in tiles]
    if n_tiles == 1:
        offsets_field = (324, 4, 1, offs[0])
    else:
        offsets_field = (324, 4, n_tiles, alloc(struct.pack(f"<{n_tiles}I", *offs)))
    entries += [offsets_field, counts_field]
    entries.sort()
    assert len(entries) == n_entries

    out = struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += bytes(aux)
    return out


def encode_tiff_palette(
    indices: np.ndarray,
    colormap: np.ndarray,
    bits: int = 8,
    compression: str = "none",
    rows_per_strip: int | None = None,
) -> bytes:
    """HxW palette indices + (2^bits, 3) uint8 colormap -> little-endian
    palette TIFF (photometric 3).  4-bit indices pack two-per-byte
    high-nibble-first with row byte-alignment; ColorMap SHORTs use the
    value*257 convention so the decoder's >>8 recovers the exact uint8."""
    if bits not in (4, 8):
        raise ValueError("palette bits must be 4 or 8")
    ncol = 1 << bits
    cmap = np.asarray(colormap, np.uint8)
    if cmap.shape != (ncol, 3):
        raise ValueError(f"colormap must be ({ncol}, 3), got {cmap.shape}")
    idx = np.asarray(indices, np.uint8)
    h, w = idx.shape
    if int(idx.max(initial=0)) >= ncol:
        raise ValueError("palette index out of colormap range")
    if bits == 4:
        padded = idx if w % 2 == 0 else np.pad(idx, ((0, 0), (0, 1)))
        rowdat = (padded[:, 0::2] << 4) | padded[:, 1::2]
    else:
        rowdat = idx
    row_bytes = rowdat.shape[1]
    rows_per_strip = rows_per_strip or h
    comp_code = {"none": 1, "packbits": 32773, "lzw": 5}[compression]

    strips = []
    for y0 in range(0, h, rows_per_strip):
        seg = rowdat[y0 : y0 + rows_per_strip].tobytes()
        if compression == "none":
            strips.append(seg)
        elif compression == "packbits":
            strips.append(
                b"".join(
                    _packbits(seg[r : r + row_bytes])
                    for r in range(0, len(seg), row_bytes)
                )
            )
        else:
            strips.append(_lzw_encode_tiff(seg))

    entries = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, comp_code), (262, 3, 1, 3), (277, 3, 1, 1),
        (278, 3, 1, rows_per_strip),
    ]
    n_strips = len(strips)
    n_entries = len(entries) + 3  # + colormap, strip_offsets, strip_counts
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    aux = bytearray()

    def alloc(buf: bytes) -> int:
        off = data_off + len(aux)
        aux.extend(buf)
        return off

    # ColorMap: all R values, then G, then B, as SHORTs (spec section 5)
    cm_shorts = (cmap.T.astype(np.uint16) * 257).reshape(-1)
    entries.append(
        (320, 3, 3 * ncol, alloc(struct.pack(f"<{3 * ncol}H", *cm_shorts)))
    )
    if n_strips == 1:
        counts_field = (279, 4, 1, len(strips[0]))
    else:
        counts_field = (
            279, 4, n_strips,
            alloc(struct.pack(f"<{n_strips}I", *[len(s) for s in strips])),
        )
    offs = [alloc(s) for s in strips]
    if n_strips == 1:
        offsets_field = (273, 4, 1, offs[0])
    else:
        offsets_field = (273, 4, n_strips, alloc(struct.pack(f"<{n_strips}I", *offs)))
    entries += [offsets_field, counts_field]
    entries.sort()
    assert len(entries) == n_entries

    out = struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", n_entries)
    for tag, typ, cnt, val in entries:
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += bytes(aux)
    return out
