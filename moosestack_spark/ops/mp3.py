"""MP3 (MPEG-1 Layer III) container metadata: frame-header walk + ID3v2.

The audio-DECODE boundary stays honest (no MDCT/huffman synthesis without
an audio stack — see ops/multimodal.py), but everything a curation
pipeline reads from an .mp3 *without* decoding is real here:

- ID3v2.3 tag parse (syncsafe sizes, text frames, latin-1 + UTF-16)
- frame sync walk with header validation (version/layer/bitrate/rate)
- exact integer duration from the frame count (1152 samples per MPEG-1
  Layer III frame), CBR/VBR detection from the bitrate-index set

Reference parity note: MooseStack ships no codec code at all (payloads are
opaque bytes to packages/py-moose-lib); this module is beyond-reference
surface for the multimodal-curation family, same contract as
ops/multimodal.py's MP4 box walk.

Everything is deterministic integer arithmetic so the planting generator
replays exactly in DuckDB SQL (see the gate oracle at the bottom).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np  # noqa: F401  (kept for parity with sibling modules)

# MPEG-1 Layer III tables (ISO/IEC 11172-3)
BITRATE_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
SAMPLE_RATE = (44100, 48000, 32000, None)
SAMPLES_PER_FRAME = 1152


def _syncsafe(n: int) -> bytes:
    """28-bit syncsafe integer (7 bits per byte, MSB clear) — ID3v2 sizes."""
    return bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))


def _unsyncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def encode_id3v2(frames: dict[str, str]) -> bytes:
    """ID3v2.3 tag with latin-1 text frames ({'TIT2': 'title', ...})."""
    body = b""
    for fid, text in frames.items():
        payload = b"\x00" + text.encode("latin-1")
        body += fid.encode("ascii") + struct.pack(">I", len(payload)) + b"\x00\x00" + payload
    return b"ID3\x03\x00\x00" + _syncsafe(len(body)) + body


def frame_length(bitrate_idx: int, rate_idx: int, padding: int = 0) -> int:
    """Exact MPEG-1 Layer III frame length in bytes (integer floor)."""
    kbps = BITRATE_KBPS[bitrate_idx]
    rate = SAMPLE_RATE[rate_idx]
    if kbps is None or rate is None:
        raise ValueError("free/bad bitrate or reserved sample-rate index")
    return 144 * kbps * 1000 // rate + padding


def encode_mp3(
    n_frames: int,
    bitrate_idx: int,
    rate_idx: int,
    title: str | None = None,
    padding_rule=None,
) -> bytes:
    """Planting helper: a structurally-valid CBR MP3 — optional ID3v2.3
    tag followed by ``n_frames`` sync-valid frames with zeroed payloads
    (all that the metadata walk reads).  ``padding_rule(i) -> 0|1`` lets
    tests exercise per-frame padding without breaking determinism."""
    out = bytearray()
    if title is not None:
        out += encode_id3v2({"TIT2": title})
    for i in range(n_frames):
        pad = padding_rule(i) if padding_rule else 0
        hdr = (
            (0x7FF << 21)
            | (0b11 << 19)  # MPEG-1
            | (0b01 << 17)  # Layer III
            | (1 << 16)     # no CRC
            | (bitrate_idx << 12)
            | (rate_idx << 10)
            | (pad << 9)
            | (0b11 << 6)   # mono
        )
        out += struct.pack(">I", hdr)
        out += b"\x00" * (frame_length(bitrate_idx, rate_idx, pad) - 4)
    return bytes(out)


def _parse_id3v2(data: bytes) -> tuple[dict[str, str], int]:
    """Parse a leading ID3v2.3/2.4 tag -> ({frame_id: text}, tag_end)."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}, 0
    size = _unsyncsafe(data[6:10])
    end = 10 + size
    frames: dict[str, str] = {}
    pos = 10
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":  # padding
            break
        fsize = struct.unpack_from(">I", data, pos + 4)[0]
        body = data[pos + 10 : pos + 10 + fsize]
        if fid[:1] == b"T" and body:
            enc, text = body[0], body[1:]
            if enc == 0:
                frames[fid.decode("ascii")] = text.decode("latin-1")
            elif enc == 1:
                frames[fid.decode("ascii")] = text.decode("utf-16")
        pos += 10 + fsize
    return frames, end


def parse_mp3_metadata(data: bytes) -> dict:
    """Walk the frame chain and return exact container metadata:

    ``{n_frames, sample_rate, bitrate_kbps, duration_ms, cbr, title}``

    ``duration_ms`` is integer-exact: ``n_frames * 1152 * 1000 // rate``.
    ``bitrate_kbps`` is the single CBR rate, or the integer mean over
    frames for VBR streams (``cbr`` False).  Raises ValueError when no
    valid frame chain is found (the strict-sniffer contract).
    """
    tags, pos = _parse_id3v2(data)
    n_frames = 0
    rate = None
    kbps_sum = 0
    kbps_set: set[int] = set()
    while pos + 4 <= len(data):
        hdr = struct.unpack_from(">I", data, pos)[0]
        if (hdr >> 21) != 0x7FF:
            break
        version = (hdr >> 19) & 0b11
        layer = (hdr >> 17) & 0b11
        bidx = (hdr >> 12) & 0xF
        ridx = (hdr >> 10) & 0b11
        pad = (hdr >> 9) & 1
        if version != 0b11 or layer != 0b01 or bidx in (0, 15) or ridx == 3:
            raise ValueError("unsupported MPEG header (not MPEG-1 Layer III)")
        frate = SAMPLE_RATE[ridx]
        if rate is not None and frate != rate:
            raise ValueError("sample-rate change mid-stream")
        rate = frate
        kbps = BITRATE_KBPS[bidx]
        kbps_sum += kbps
        kbps_set.add(kbps)
        n_frames += 1
        pos += frame_length(bidx, ridx, pad)
    if n_frames == 0 or rate is None:
        raise ValueError("no MPEG frame sync found")
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "bitrate_kbps": kbps_sum // n_frames,
        "duration_ms": n_frames * SAMPLES_PER_FRAME * 1000 // rate,
        "cbr": len(kbps_set) == 1,
        "title": tags.get("TIT2"),
    }


def sniff_is_mp3(data: bytes) -> bool:
    """Cheap route check: ID3v2 magic or a valid MPEG-1 L3 sync header."""
    if data[:3] == b"ID3":
        return True
    if len(data) >= 4:
        hdr = struct.unpack_from(">I", data, 0)[0]
        return (
            (hdr >> 21) == 0x7FF
            and ((hdr >> 19) & 0b11) == 0b11
            and ((hdr >> 17) & 0b11) == 0b01
        )
    return False


# --------------------------------------------------------------------------
# gate query
# --------------------------------------------------------------------------

def _register_gate_queries() -> None:
    import pandas as pd
    from pyspark.sql import DataFrame, functions as F
    from pyspark.sql.types import (
        BooleanType, IntegerType, LongType, StringType, StructField, StructType,
    )

    from moosestack_spark.registry import query

    @query(
        "multimodal_mp3_metadata",
        oracle="""
WITH p AS (
  SELECT doc_id,
         CAST(1 + doc_id % 14 AS INTEGER) AS bidx,
         CAST(doc_id % 3 AS INTEGER) AS ridx,
         CAST(8 + doc_id % 24 AS BIGINT) AS nf
  FROM documents WHERE doc_id % 4 = 1
), r AS (
  SELECT doc_id, nf,
         CASE bidx WHEN 1 THEN 32 WHEN 2 THEN 40 WHEN 3 THEN 48 WHEN 4 THEN 56
                   WHEN 5 THEN 64 WHEN 6 THEN 80 WHEN 7 THEN 96 WHEN 8 THEN 112
                   WHEN 9 THEN 128 WHEN 10 THEN 160 WHEN 11 THEN 192
                   WHEN 12 THEN 224 WHEN 13 THEN 256 ELSE 320 END AS kbps,
         CASE ridx WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS rate
  FROM p
)
SELECT doc_id AS media_id,
       nf AS n_frames,
       CAST(rate AS INTEGER) AS sample_rate,
       CAST(kbps AS INTEGER) AS bitrate_kbps,
       CAST(nf * 1152 * 1000 // rate AS BIGINT) AS duration_ms,
       TRUE AS cbr,
       'track-' || CAST(doc_id AS VARCHAR) AS title
FROM r
""",
    )
    def multimodal_mp3_metadata(spark, sf_dir: str) -> DataFrame:
        """REAL MP3 container parsing: per audio doc a structurally-valid
        CBR MP3 (ID3v2.3 TIT2 + sync-valid MPEG-1 L3 frame chain) is
        planted and the kernel walks it — tag syncsafe sizes, frame-length
        arithmetic (144*kbps*1000//rate), exact 1152-samples-per-frame
        duration.  Audio DECODE stays honestly stubbed (ops/multimodal.py);
        this is the metadata half, same split as the MP4 box walk.  The
        oracle replays the planting arithmetic, so the frame walk is
        hash-checked end-to-end."""
        from moosestack_spark.tables import t as _t

        d = _t(spark, sf_dir, "documents").select("doc_id").filter(
            F.col("doc_id") % 4 == 1
        )

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = {
                    "media_id": [], "n_frames": [], "sample_rate": [],
                    "bitrate_kbps": [], "duration_ms": [], "cbr": [],
                    "title": [],
                }
                for did in pdf["doc_id"]:
                    did = int(did)
                    payload = encode_mp3(
                        8 + did % 24, 1 + did % 14, did % 3,
                        title=f"track-{did}",
                    )
                    meta = parse_mp3_metadata(payload)
                    out["media_id"].append(did)
                    out["n_frames"].append(meta["n_frames"])
                    out["sample_rate"].append(meta["sample_rate"])
                    out["bitrate_kbps"].append(meta["bitrate_kbps"])
                    out["duration_ms"].append(meta["duration_ms"])
                    out["cbr"].append(meta["cbr"])
                    out["title"].append(meta["title"])
                yield pd.DataFrame(out)

        return d.mapInPandas(
            kernel,
            StructType(
                [
                    StructField("media_id", LongType(), False),
                    StructField("n_frames", LongType(), False),
                    StructField("sample_rate", IntegerType(), False),
                    StructField("bitrate_kbps", IntegerType(), False),
                    StructField("duration_ms", LongType(), False),
                    StructField("cbr", BooleanType(), False),
                    StructField("title", StringType(), True),
                ]
            ),
        )


_register_gate_queries()
