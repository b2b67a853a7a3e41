"""Ogg encapsulation + Ogg-FLAC mapping (pure stdlib/numpy).

Implements the public Ogg bitstream framing (RFC 3533: "OggS" pages,
lacing-value packet segmentation, continuation/BOS/EOS flags, the
non-reflected CRC-32 with polynomial 0x04C11DB7) and the Ogg-FLAC mapping
(FLAC format spec section "FLAC-to-Ogg mapping": first packet =
0x7F 'FLAC' major minor n_headers(2BE) + native 'fLaC' header, then one
audio frame per packet).

This closes ops/flac.py's one declared container boundary: the audio
sniffer now covers fLaC-native AND Ogg-encapsulated FLAC.  Ogg-Vorbis /
Ogg-Opus payloads are recognized as Ogg but raise honestly — those codecs
are lossy and out of scope (same policy as VP8-lossy inside WebP).
"""

from __future__ import annotations

import struct

import numpy as np

OGG_MAGIC = b"OggS"


def _ogg_crc_table() -> list[int]:
    table = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 else (r << 1) & 0xFFFFFFFF
        table.append(r)
    return table


_CRC_TABLE = _ogg_crc_table()


def ogg_crc(data: bytes) -> int:
    """Ogg page CRC-32: poly 0x04C11DB7, init 0, no reflection, xorout 0."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def _page(
    serial: int,
    seq: int,
    granule: int,
    segments: list[bytes],
    header_type: int,
) -> bytes:
    lacing = bytearray()
    body = bytearray()
    for seg in segments:
        lacing.append(len(seg))
        body += seg
    head = (
        OGG_MAGIC
        + b"\x00"  # version
        + bytes([header_type])
        + struct.pack("<q", granule)
        + struct.pack("<I", serial)
        + struct.pack("<I", seq)
        + b"\x00\x00\x00\x00"  # CRC placeholder
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    crc = ogg_crc(head + bytes(body))
    return head[:22] + struct.pack("<I", crc) + head[26:] + bytes(body)


def write_ogg(packets: list[tuple[bytes, int]], serial: int = 0x464C4143) -> bytes:
    """Packets [(payload, granule_position)] -> Ogg stream.  One packet per
    page run; packets longer than 255*255 bytes continue onto follow-on
    pages with the continuation flag, per RFC 3533."""
    out = bytearray()
    seq = 0
    n = len(packets)
    for idx, (payload, granule) in enumerate(packets):
        # lacing segmentation: 255-byte segments, final segment < 255
        # (a multiple-of-255 packet needs a trailing 0 lacing value)
        segs = [payload[i : i + 255] for i in range(0, len(payload), 255)]
        if not segs or len(segs[-1]) == 255:
            segs.append(b"")
        first_page = True
        while segs:
            page_segs, segs = segs[:255], segs[255:]
            htype = 0
            if not first_page:
                htype |= 0x01  # continuation
            if idx == 0 and first_page:
                htype |= 0x02  # BOS
            if idx == n - 1 and not segs:
                htype |= 0x04  # EOS
            # granule: -1 on pages where no packet completes
            g = granule if not segs else -1
            out += _page(serial, seq, g, page_segs, htype)
            seq += 1
            first_page = False
    return bytes(out)


def parse_ogg(data: bytes) -> list[bytes]:
    """Ogg stream -> reassembled packet payloads (CRC-verified pages)."""
    packets: list[bytes] = []
    partial = bytearray()
    off = 0
    while off < len(data):
        if data[off : off + 4] != OGG_MAGIC:
            raise ValueError(f"bad Ogg page magic at offset {off}")
        if data[off + 4] != 0:
            raise ValueError(f"unsupported Ogg version {data[off + 4]}")
        n_segs = data[off + 26]
        lacing = data[off + 27 : off + 27 + n_segs]
        body_off = off + 27 + n_segs
        body_len = sum(lacing)
        page = bytearray(data[off : body_off + body_len])
        stored_crc = struct.unpack("<I", page[22:26])[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != stored_crc:
            raise ValueError(f"Ogg page CRC mismatch at offset {off}")
        pos = body_off
        for lace in lacing:
            partial += data[pos : pos + lace]
            pos += lace
            if lace < 255:  # packet complete
                packets.append(bytes(partial))
                partial = bytearray()
        off = body_off + body_len
    if partial:
        raise ValueError("truncated Ogg stream: unterminated packet")
    return packets


# ---------------------------------------------------------------------------
# Ogg-FLAC mapping
# ---------------------------------------------------------------------------

_FLAC_MAPPING_MAGIC = b"\x7fFLAC"


def encode_ogg_flac(
    samples: np.ndarray,
    rate: int = 16000,
    block_size: int = 4096,
    modes: tuple[str, ...] = ("fixed2",),
    mid_side: bool = False,
) -> bytes:
    """int16 samples -> Ogg-encapsulated FLAC: first packet is the mapping
    header + native fLaC STREAMINFO, then one audio frame per packet with
    cumulative-sample granule positions."""
    from moosestack_spark.ops.flac import encode_flac_parts

    header, frames = encode_flac_parts(samples, rate, block_size, modes, mid_side)
    first = _FLAC_MAPPING_MAGIC + bytes([1, 0]) + struct.pack(">H", 0) + header
    packets: list[tuple[bytes, int]] = [(first, 0)]
    s = np.asarray(samples)
    n = s.shape[0]
    done = 0
    for frame in frames:
        done = min(done + block_size, n)
        packets.append((frame, done))
    return write_ogg(packets)


def decode_ogg_flac(data: bytes) -> tuple[np.ndarray, int]:
    """Ogg-FLAC bytes -> (samples int16 (n, channels), rate): reassemble
    packets, strip the mapping header, rebuild the native stream, and run
    the full ops/flac.py decoder."""
    from moosestack_spark.ops.flac import decode_flac

    packets = parse_ogg(data)
    if not packets:
        raise ValueError("empty Ogg stream")
    first = packets[0]
    if first[:5] != _FLAC_MAPPING_MAGIC:
        codec = first[:8]
        if codec[:7] == b"\x01vorbis":
            raise NotImplementedError("Ogg-Vorbis (lossy) decode not implemented")
        if codec == b"OpusHead":
            raise NotImplementedError("Ogg-Opus (lossy) decode not implemented")
        raise ValueError(f"not an Ogg-FLAC stream (first packet {codec!r})")
    major = first[5]
    if major != 1:
        raise ValueError(f"unsupported Ogg-FLAC mapping version {major}")
    (n_headers,) = struct.unpack(">H", first[7:9])
    native = bytearray(first[9:])
    if native[:4] != b"fLaC":
        raise ValueError("Ogg-FLAC first packet missing native fLaC header")
    # force the last-metadata-block bit on STREAMINFO: any extra metadata
    # travels in separate header packets we skip below
    native[4] |= 0x80
    for frame in packets[1 + n_headers :]:
        native += frame
    return decode_flac(bytes(native))
