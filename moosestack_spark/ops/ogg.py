"""Ogg encapsulation + Ogg-FLAC mapping (pure stdlib/numpy).

Implements the public Ogg bitstream framing (RFC 3533: "OggS" pages,
lacing-value packet segmentation, continuation/BOS/EOS flags, the
non-reflected CRC-32 with polynomial 0x04C11DB7) and the Ogg-FLAC mapping
(FLAC format spec section "FLAC-to-Ogg mapping": first packet =
0x7F 'FLAC' major minor n_headers(2BE) + native 'fLaC' header, then one
audio frame per packet).

This closes ops/flac.py's one declared container boundary: the audio
sniffer now covers fLaC-native AND Ogg-encapsulated FLAC.  For Ogg-Vorbis
and Ogg-Opus the METADATA path is real (ogg_stream_meta: spec-exact
id/comment header parsing per the Vorbis I spec and RFC 7845, duration
from granule positions) while audio DECODE raises honestly — those codecs'
DSP is out of scope (same policy as VP8-lossy inside WebP and ops/mp3.py's
frame walk).
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


def parse_ogg_with_granules(data: bytes) -> tuple[list[bytes], int]:
    """Ogg stream -> (reassembled packet payloads, last granule position)
    over CRC-verified pages.  The last granule is taken from the final page
    whose granule is not -1 (pages where no packet completes carry -1 per
    RFC 3533) — for a well-formed stream that is the EOS page, i.e. the
    stream's total-duration granule."""
    packets: list[bytes] = []
    partial = bytearray()
    off = 0
    last_granule = 0
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
        granule = struct.unpack("<q", page[6:14])[0]
        if granule != -1:
            last_granule = granule
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
    return packets, last_granule


def parse_ogg(data: bytes) -> list[bytes]:
    """Ogg stream -> reassembled packet payloads (CRC-verified pages)."""
    return parse_ogg_with_granules(data)[0]


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


# ---------------------------------------------------------------------------
# Ogg-Vorbis / Ogg-Opus metadata walk (no audio decode — same policy as
# ops/mp3.py: the CONTAINER and tag structures are real per the public
# specs (Vorbis I spec §4.2 id/comment headers; RFC 7845 OpusHead/OpusTags),
# duration comes from granule positions; codec DSP stays an honest
# NotImplementedError in decode_ogg_flac's routing above).
# ---------------------------------------------------------------------------


def _vorbis_comment_bytes(vendor: str, tags: dict[str, str]) -> bytes:
    """Vorbis-comment block body (shared verbatim by Vorbis comment headers
    and OpusTags, per RFC 7845 §5.2): vendor string + KEY=value list, all
    lengths little-endian u32."""
    out = bytearray()
    vb = vendor.encode("utf-8")
    out += struct.pack("<I", len(vb)) + vb
    out += struct.pack("<I", len(tags))
    for k, v in tags.items():
        kv = f"{k}={v}".encode("utf-8")
        out += struct.pack("<I", len(kv)) + kv
    return bytes(out)


def _parse_vorbis_comment(buf: bytes) -> tuple[str, dict[str, str]]:
    (vlen,) = struct.unpack_from("<I", buf, 0)
    vendor = buf[4 : 4 + vlen].decode("utf-8")
    off = 4 + vlen
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    tags: dict[str, str] = {}
    for _ in range(n):
        (clen,) = struct.unpack_from("<I", buf, off)
        off += 4
        item = buf[off : off + clen].decode("utf-8")
        off += clen
        k, _, v = item.partition("=")
        tags[k.upper()] = v  # field names are case-insensitive per spec
    return vendor, tags


def encode_ogg_vorbis_meta(
    n_samples: int,
    rate: int,
    channels: int,
    tags: dict[str, str],
    vendor: str = "moosestack_spark",
    packet_samples: int = 1024,
) -> bytes:
    """Header-accurate Ogg-Vorbis stream for the METADATA path: the
    identification and comment headers are byte-exact per the Vorbis I
    spec (§4.2.2/§4.2.3, framing bits included); the setup header and the
    audio packets are opaque placeholders with CORRECT granule positions —
    no Vorbis DSP is implemented (honest boundary), which is exactly what
    a metadata walker never touches."""
    ident = (
        b"\x01vorbis"
        + struct.pack("<I", 0)  # vorbis_version
        + bytes([channels])
        + struct.pack("<I", rate)
        + struct.pack("<iii", 0, 0, 0)  # bitrate max/nominal/min
        + bytes([0xB8])  # blocksize_0=2^8, blocksize_1=2^11
        + b"\x01"  # framing bit
    )
    comment = b"\x03vorbis" + _vorbis_comment_bytes(vendor, tags) + b"\x01"
    setup = b"\x05vorbis" + b"\x00" * 16  # placeholder (codec-internal)
    packets: list[tuple[bytes, int]] = [(ident, 0), (comment, 0), (setup, 0)]
    done = 0
    i = 0
    while done < n_samples:
        done = min(done + packet_samples, n_samples)
        packets.append((bytes([0x00, i & 0xFF, 0x55]), done))
        i += 1
    return write_ogg(packets, serial=0x564F5242)


def encode_ogg_opus_meta(
    n_samples_48k: int,
    channels: int,
    tags: dict[str, str],
    pre_skip: int = 312,
    vendor: str = "moosestack_spark",
    packet_samples: int = 960,
) -> bytes:
    """Header-accurate Ogg-Opus stream for the METADATA path: OpusHead and
    OpusTags are byte-exact per RFC 7845 (§5.1/§5.2); audio packets are
    opaque placeholders with correct 48 kHz granule positions (granule =
    pre_skip + decoded samples, per §4).  No Opus DSP (honest boundary)."""
    head = (
        b"OpusHead"
        + bytes([1, channels])  # version, channel count
        + struct.pack("<H", pre_skip)
        + struct.pack("<I", 48000)  # input sample rate (informational)
        + struct.pack("<h", 0)  # output gain
        + bytes([0])  # mapping family 0
    )
    tags_p = b"OpusTags" + _vorbis_comment_bytes(vendor, tags)
    packets: list[tuple[bytes, int]] = [(head, 0), (tags_p, 0)]
    done = 0
    i = 0
    while done < n_samples_48k:
        done = min(done + packet_samples, n_samples_48k)
        packets.append((bytes([0xFC, i & 0xFF]), pre_skip + done))
        i += 1
    return write_ogg(packets, serial=0x4F505553)


def ogg_stream_meta(data: bytes) -> dict:
    """Ogg container metadata walk: codec id, channels, sample rate,
    vendor + comment tags, duration from the last granule position.
    Covers Ogg-Vorbis, Ogg-Opus and Ogg-FLAC; never decodes audio."""
    packets, last_granule = parse_ogg_with_granules(data)
    if not packets:
        raise ValueError("empty Ogg stream")
    first = packets[0]
    if first[:7] == b"\x01vorbis":
        channels = first[11]
        (rate,) = struct.unpack_from("<I", first, 12)
        vendor, tags = "", {}
        for p in packets[1:4]:
            if p[:7] == b"\x03vorbis":
                vendor, tags = _parse_vorbis_comment(p[7:])
                break
        return {
            "codec": "vorbis",
            "channels": channels,
            "sample_rate": rate,
            "duration_ms": last_granule * 1000 // rate,
            "vendor": vendor,
            "tags": tags,
        }
    if first[:8] == b"OpusHead":
        channels = first[9]
        (pre_skip,) = struct.unpack_from("<H", first, 10)
        vendor, tags = "", {}
        if len(packets) > 1 and packets[1][:8] == b"OpusTags":
            vendor, tags = _parse_vorbis_comment(packets[1][8:])
        # the granule clock is ALWAYS 48 kHz for Opus (RFC 7845 §4); the
        # OpusHead input rate is informational only
        return {
            "codec": "opus",
            "channels": channels,
            "sample_rate": 48000,
            "duration_ms": max(0, last_granule - pre_skip) * 1000 // 48000,
            "vendor": vendor,
            "tags": tags,
        }
    if first[:5] == _FLAC_MAPPING_MAGIC:
        native = first[9:]
        if native[:4] != b"fLaC":
            raise ValueError("Ogg-FLAC first packet missing native header")
        # STREAMINFO is the mandatory first metadata block: 16 header bits
        # of min/max block size + 48 of frame sizes, then rate(20) /
        # channels-1(3) / bps-1(5) / total(36)
        si = native[8:]
        rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
        channels = ((si[12] >> 1) & 0x07) + 1
        vendor, tags = "", {}
        return {
            "codec": "flac",
            "channels": channels,
            "sample_rate": rate,
            "duration_ms": last_granule * 1000 // rate if rate else 0,
            "vendor": vendor,
            "tags": tags,
        }
    raise ValueError(f"unknown Ogg codec (first packet {first[:8]!r})")


def sniff_is_ogg(data: bytes) -> bool:
    """Cheap route check: RFC 3533 capture pattern."""
    return data[:4] == OGG_MAGIC


# ---------------------------------------------------------------------------
# gate query
# ---------------------------------------------------------------------------


def _register_gate_queries() -> None:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import DataFrame, functions as F
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    from moosestack_spark.registry import query

    @query(
        "multimodal_ogg_metadata",
        oracle="""
WITH p AS (
  SELECT doc_id, CAST(doc_id % 2 AS INTEGER) AS is_opus,
         CAST(8 + doc_id % 24 AS BIGINT) AS nu,
         CAST(doc_id % 3 AS INTEGER) AS r3
  FROM documents WHERE doc_id % 4 = 2
)
SELECT doc_id AS media_id,
       CASE WHEN is_opus = 1 THEN 'opus' ELSE 'vorbis' END AS codec,
       CAST(1 + (doc_id // 2) % 2 AS INTEGER) AS channels,
       CAST(CASE WHEN is_opus = 1 THEN 48000
                 WHEN r3 = 0 THEN 44100 WHEN r3 = 1 THEN 48000
                 ELSE 32000 END AS INTEGER) AS sample_rate,
       CAST(CASE WHEN is_opus = 1 THEN nu * 960 * 1000 // 48000
                 ELSE nu * 1024 * 1000 //
                      (CASE WHEN r3 = 0 THEN 44100 WHEN r3 = 1 THEN 48000
                            ELSE 32000 END)
            END AS BIGINT) AS duration_ms,
       'moosestack_spark' AS vendor,
       'track-' || CAST(doc_id AS VARCHAR) AS title
FROM p
""",
    )
    def multimodal_ogg_metadata(spark, sf_dir: str) -> DataFrame:
        """REAL Ogg container parsing for the two common lossy-audio
        mappings: per audio doc a header-accurate Ogg-Vorbis or Ogg-Opus
        stream (spec-exact id/comment headers, CRC'd RFC 3533 pages,
        correct granule positions; audio packets are opaque — codec DSP is
        the documented boundary) is planted and the kernel walks it: codec
        id, channel count, rate, vendor + TITLE tag, and duration from the
        last granule (minus pre-skip on the 48 kHz Opus clock, RFC 7845
        §4).  The oracle replays the planting arithmetic, so the page/tag
        walk is hash-checked end-to-end."""
        from moosestack_spark.tables import t as _t

        d = _t(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") % 4 == 2
        )

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {
                    "media_id": [], "codec": [], "channels": [],
                    "sample_rate": [], "duration_ms": [], "vendor": [],
                    "title": [],
                }
                for did in pdf["doc_id"]:
                    did = int(did)
                    nu = 8 + did % 24
                    channels = 1 + (did // 2) % 2
                    tags = {"TITLE": f"track-{did}"}
                    if did % 2 == 1:
                        payload = encode_ogg_opus_meta(
                            nu * 960, channels, tags
                        )
                    else:
                        rate = (44100, 48000, 32000)[did % 3]
                        payload = encode_ogg_vorbis_meta(
                            nu * 1024, rate, channels, tags
                        )
                    meta = ogg_stream_meta(payload)
                    out["media_id"].append(did)
                    out["codec"].append(meta["codec"])
                    out["channels"].append(meta["channels"])
                    out["sample_rate"].append(meta["sample_rate"])
                    out["duration_ms"].append(meta["duration_ms"])
                    out["vendor"].append(meta["vendor"])
                    out["title"].append(meta["tags"].get("TITLE"))
                yield pd.DataFrame(out)

        return d.mapInPandas(
            kernel,
            StructType(
                [
                    StructField("media_id", LongType(), False),
                    StructField("codec", StringType(), False),
                    StructField("channels", IntegerType(), False),
                    StructField("sample_rate", IntegerType(), False),
                    StructField("duration_ms", LongType(), False),
                    StructField("vendor", StringType(), False),
                    StructField("title", StringType(), True),
                ]
            ),
        )


_register_gate_queries()
