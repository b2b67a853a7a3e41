"""Pure-Python GIF decoder (GIF87a/GIF89a).

Completes the web-crawl image set next to ops/jpeg.py and ops/png.py: the
container walk (logical screen descriptor, global/local color tables,
graphic-control extensions), variable-code-width LZW decompression, and
Adam-style 4-pass interlacing all implement the public GIF specification.
decode_gif still returns the FIRST frame (the training-pipeline
stills contract); decode_gif_frames walks EVERY frame with
graphic-control timing, sub-rectangle placement, transparency
pass-through and disposal compositing (0/1 leave, 2 restore-to-
background; 3 raises).  Transparency composites over white like the PNG
path.

Encoders: minimal single-frame GIF and encode_gif_animation (per-frame
local color tables, GCE delays/disposal), both with uncompressed-style
LZW (clear code before every pixel code — valid per spec, trivially
correct) — they plant real bytes for tests and gates.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_gif(data: bytes) -> np.ndarray:
    """First frame of a GIF -> HxWx3 uint8 RGB (transparent pixels
    composited over white)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    transparent_idx = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = data[pos]
                gc_flags = data[pos + 1]
                if gc_flags & 0x01:
                    transparent_idx = data[pos + 4]
                pos += 1 + size
            # skip remaining sub-blocks
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _ix, _iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("no color table")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                size = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + size])
                pos += 1 + size
            pos += 1
            indices = _lzw_decode(b"".join(chunks), min_code_size, iw * ih)
            idx = np.array(indices, dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                order = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                deinterlaced = np.empty_like(idx)
                deinterlaced[order] = idx
                idx = deinterlaced
            rgb = ct[np.clip(idx, 0, len(ct) - 1)]
            if transparent_idx is not None:
                rgb = np.where((idx == transparent_idx)[..., None], 255, rgb)
            return rgb.astype(np.uint8)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("no image data in GIF")


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """Variable-width LZW per the GIF spec (LSB-first bit packing)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while pos < len(data) or nbits >= code_size:
        while nbits < code_size and pos < len(data):
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and code not in (clear, end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out.extend(entry)
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= max_pixels:
            break
    return out[:max_pixels]


def encode_gif(pixels_idx: np.ndarray, color_table: np.ndarray) -> bytes:
    """HxW palette indices + Nx3 color table -> single-frame GIF89a.
    LZW stream emits a clear code before every pixel code — spec-valid
    and trivially correct (no table management needed)."""
    h, w = pixels_idx.shape
    n = len(color_table)
    depth = max(2, int(np.ceil(np.log2(max(n, 2)))))
    ct_size = 1 << depth
    ct = np.zeros((ct_size, 3), np.uint8)
    ct[:n] = color_table
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += ct.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code_size = depth
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    stream = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    for v in pixels_idx.reshape(-1):
        emit(clear)  # reset table: every code stays min_code_size+1 bits
        emit(int(v))
    emit(end)
    if nbits:
        stream.append(acc & 0xFF)
    out += bytes([min_code_size])
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Animated GIF: full multi-frame walk with graphic-control timing and
# disposal compositing — upgrades the documented first-frame-only boundary.
# Disposal methods per the GIF89a spec: 0/1 leave the canvas, 2 restores
# the frame rect to background (white here, same convention as the still
# path's transparency), 3 (restore-previous) raises — honest boundary.
# ---------------------------------------------------------------------------


def decode_gif_frames(data: bytes) -> list[dict]:
    """Every frame of a GIF, COMPOSITED: returns
    [{"delay_cs": int, "pixels": HxWx3 uint8}, ...] where pixels is the
    full logical-screen canvas after drawing the frame (sub-rectangle
    frames overwrite only their rect; transparent pixels keep the prior
    canvas)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    canvas = np.full((sh, sw, 3), 255, np.uint8)
    frames: list[dict] = []
    delay_cs = 0
    transparent_idx = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:
                size = data[pos]
                gc_flags = data[pos + 1]
                delay_cs = struct.unpack_from("<H", data, pos + 2)[0]
                disposal = (gc_flags >> 2) & 0x07
                transparent_idx = (
                    data[pos + 4] if gc_flags & 0x01 else None
                )
                pos += 1 + size
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
                pos += n * 3
            if ct is None:
                raise ValueError("no color table")
            min_code_size = data[pos]
            pos += 1
            chunks = []
            while data[pos] != 0:
                size = data[pos]
                chunks.append(data[pos + 1 : pos + 1 + size])
                pos += 1 + size
            pos += 1
            indices = _lzw_decode(b"".join(chunks), min_code_size, iw * ih)
            idx = np.array(indices, dtype=np.int32).reshape(ih, iw)
            if iflags & 0x40:
                order = np.concatenate(
                    [np.arange(0, ih, 8), np.arange(4, ih, 8),
                     np.arange(2, ih, 4), np.arange(1, ih, 2)]
                )
                deinterlaced = np.empty_like(idx)
                deinterlaced[order] = idx
                idx = deinterlaced
            rgb = ct[np.clip(idx, 0, len(ct) - 1)].astype(np.uint8)
            rect = canvas[iy : iy + ih, ix : ix + iw]
            if transparent_idx is not None:
                mask = (idx == transparent_idx)[..., None]
                rect[:] = np.where(mask, rect, rgb)
            else:
                rect[:] = rgb
            frames.append({"delay_cs": delay_cs, "pixels": canvas.copy()})
            if disposal == 2:  # restore rect to background (white)
                canvas[iy : iy + ih, ix : ix + iw] = 255
            elif disposal == 3:
                raise NotImplementedError(
                    "GIF disposal 3 (restore to previous) not supported"
                )
            delay_cs = 0
            transparent_idx = None
            disposal = 0
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02X}")
    if not frames:
        raise ValueError("no image data in GIF")
    return frames


def gif_animation_meta(data: bytes) -> dict:
    """Container metadata for the video sniffer: frame count + duration
    from the graphic-control delays (no compositing)."""
    frames = decode_gif_frames(data)
    return {
        "codec": "gif",
        "width": frames[0]["pixels"].shape[1],
        "height": frames[0]["pixels"].shape[0],
        "n_frames": len(frames),
        "duration_ms": sum(f["delay_cs"] for f in frames) * 10,
    }


def encode_gif_animation(
    frames: list[dict], screen: tuple[int, int]
) -> bytes:
    """Animated GIF89a.  Each frame dict:
    {"idx": hxw uint8 palette indices, "ct": Nx3 uint8 color table,
     "x": int, "y": int, "delay_cs": int, "disposal": int,
     "transparent_idx": Optional[int]}.
    Every frame writes a LOCAL color table (exercises the per-frame-table
    path) and the per-pixel-clear LZW stream of the still encoder."""
    sw, sh = screen
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0, 0, 0)  # no global color table
    for f in frames:
        idx = np.asarray(f["idx"], np.uint8)
        h, w = idx.shape
        ct_in = np.asarray(f["ct"], np.uint8)
        depth = max(2, int(np.ceil(np.log2(max(len(ct_in), 2)))))
        ct = np.zeros((1 << depth, 3), np.uint8)
        ct[: len(ct_in)] = ct_in
        tflag = f.get("transparent_idx") is not None
        gc_flags = ((f.get("disposal", 0) & 0x07) << 2) | (1 if tflag else 0)
        out += bytes([0x21, 0xF9, 4, gc_flags])
        out += struct.pack("<H", f.get("delay_cs", 0))
        out += bytes([f.get("transparent_idx") or 0, 0])
        out += b"\x2c" + struct.pack(
            "<HHHHB", f.get("x", 0), f.get("y", 0), w, h, 0x80 | (depth - 1)
        )
        out += ct.tobytes()
        min_code_size = depth
        clear = 1 << min_code_size
        end = clear + 1
        code_size = min_code_size + 1
        acc = 0
        nbits = 0
        stream = bytearray()

        def emit(code: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += code_size
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        for v in idx.reshape(-1):
            emit(clear)
            emit(int(v))
        emit(end)
        if nbits:
            stream.append(acc & 0xFF)
        out += bytes([min_code_size])
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
