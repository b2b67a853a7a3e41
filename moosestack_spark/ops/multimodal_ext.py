"""Multimodal ops, part 2: geometry (resize) and audio framing features.

Extends ops/multimodal.py with the two transform families a training-data
image/audio pipeline runs after decode:

- resize-to-target (the gate pins the REAL nearest-neighbor resample in
  ops/multimodal.resize_images through a decoded-feature oracle — the
  DuckDB side replays the index-sampling arithmetic on the generator
  gradient, so one mis-sampled pixel fails the hash);
- framed audio features (frame the PCM into fixed windows; per-frame
  energy as exact integer sum-of-squares and a zero-crossing count — the
  integer skeleton of an energy/VAD front-end, fully SQL-replayable).

Both run as Arrow-batched mapInPandas kernels over binary payloads:
scan-side, zero shuffle, partition-parallel — the 100 TB shape where media
bytes never cross an exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from moosestack_spark.ops.multimodal import (
    IMG_H,
    IMG_W,
    WAV_N,
    WAV_RATE,
    decode_wav,
    extract_image_features,
    media_from_documents,
    resize_images,
)
from moosestack_spark.registry import query

RS_W, RS_H = 8, 6  # resize target (deliberately non-divisor of 32x16)
FRAME = 64  # audio frame length in samples (WAV_N = 256 -> 4 frames)


@query(
    "multimodal_resize_features",
    oracle=f"""
WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
grid AS (
  SELECT (tx * {IMG_W}) // {RS_W} AS x, (ty * {IMG_H}) // {RS_H} AS y
  FROM (SELECT UNNEST(generate_series(0, {RS_W - 1})) AS tx) tx
  CROSS JOIN (SELECT UNNEST(generate_series(0, {RS_H - 1})) AS ty) ty
)
SELECT doc_id AS media_id,
       {RS_W} AS width, {RS_H} AS height,
       CAST(CAST(SUM((doc_id + x + y) % 256) AS BIGINT) AS DOUBLE) / {RS_W * RS_H} AS mean_r,
       CAST(CAST(SUM((doc_id * 3 + x) % 256) AS BIGINT) AS DOUBLE) / {RS_W * RS_H} AS mean_g,
       CAST(CAST(SUM((doc_id * 5 + y) % 256) AS BIGINT) AS DOUBLE) / {RS_W * RS_H} AS mean_b
FROM img CROSS JOIN grid
GROUP BY doc_id
""",
)
def multimodal_resize_features(spark, sf_dir: str) -> DataFrame:
    """Decode -> nearest-neighbor resize 32x16 -> 8x6 -> re-encode -> decode
    -> channel means.  The oracle replays the resample index arithmetic
    (src = (dst * src_dim) // dst_dim) over the generator gradient: the
    double-decode roundtrip plus the index math must be pixel-exact."""
    media = media_from_documents(spark, sf_dir)
    imgs = media.filter(F.col("meta.media_type") == "image")
    resized = resize_images(imgs, RS_W, RS_H)
    return extract_image_features(resized).select(
        "media_id", "width", "height", "mean_r", "mean_g", "mean_b"
    )


def framed_audio_features(
    df: DataFrame,
    frame_len: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Frame decoded PCM into fixed windows; per frame emit exact integer
    energy (sum of squares) and zero-crossing count (sign transitions
    within the frame; a 0 sample counts as non-negative).  One output row
    per (media, frame) — the explode happens inside the Arrow kernel, so
    payload bytes are read once and never shuffled."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("energy", LongType(), False),
            StructField("zero_crossings", IntegerType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, energy, zc = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                samples, _rate = decode_wav(bytes(p))
                s = samples.astype(np.int64)
                n_frames = len(s) // frame_len
                for fi in range(n_frames):
                    fr = s[fi * frame_len : (fi + 1) * frame_len]
                    nonneg = fr >= 0
                    ids.append(int(mid))
                    fidx.append(fi)
                    energy.append(int(np.sum(fr * fr)))
                    zc.append(int(np.sum(nonneg[1:] != nonneg[:-1])))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "energy": pd.Series(energy, dtype="int64"),
                    "zero_crossings": pd.Series(zc, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


@query(
    "multimodal_audio_frames",
    oracle=f"""
WITH aud AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
ts AS (SELECT UNNEST(generate_series(0, {WAV_N - 1})) AS t),
samp AS (
  SELECT doc_id, t // {FRAME} AS frame_idx, t,
    (doc_id * 13 + t * 7) % 4096 - 2048 AS s,
    (doc_id * 13 + (t - 1) * 7) % 4096 - 2048 AS prev_s
  FROM aud CROSS JOIN ts
)
SELECT doc_id AS media_id, CAST(frame_idx AS INT) AS frame_idx,
  CAST(SUM(s * s) AS BIGINT) AS energy,
  CAST(SUM(CASE WHEN t % {FRAME} > 0
              AND ((s >= 0) <> (prev_s >= 0)) THEN 1 ELSE 0 END) AS INT)
    AS zero_crossings
FROM samp GROUP BY doc_id, frame_idx
""",
)
def multimodal_audio_frames(spark, sf_dir: str) -> DataFrame:
    """Real WAV decode -> 64-sample frames -> integer energy + zero
    crossings, one row per (media, frame).  Oracle replays the sawtooth
    generator per sample including the frame-boundary rule (crossings are
    counted within a frame only)."""
    media = media_from_documents(spark, sf_dir)
    auds = media.filter(F.col("meta.media_type") == "audio")
    return framed_audio_features(auds, FRAME)


# --------------------------------------------------------------------------
# EXIF/TIFF metadata extraction (PII pass).  Training pipelines strip or
# flag EXIF before images ship — GPS tags are location PII.  This is a REAL
# TIFF IFD walk (byte order, entry table, inline vs offset values, ASCII
# tag payloads, GPS sub-IFD pointer detection), pure stdlib over the binary
# column; the encoder plants spec-shaped TIFF blobs deterministically from
# doc_id so the oracle can state the construction-implied values — one
# mis-read offset or endianness bug fails the hash.
# --------------------------------------------------------------------------

_TIFF_TAG_WIDTH = 0x0100
_TIFF_TAG_HEIGHT = 0x0101
_TIFF_TAG_MAKE = 0x010F
_TIFF_TAG_ORIENTATION = 0x0112
_TIFF_TAG_GPS_IFD = 0x8825


def encode_exif(did: int) -> bytes:
    """Minimal valid little-endian TIFF: header + one IFD holding width,
    height, orientation, an ASCII Make tag (stored past the IFD — exercises
    the offset-value path) and, for did % 4 == 0, a GPS sub-IFD pointer."""
    import struct

    width = 1 + did % 512
    height = 1 + did % 384
    orientation = 1 + did % 8
    make = f"cam{did % 10}".encode() + b"\x00"
    has_gps = did % 4 == 0
    entries = [
        (_TIFF_TAG_WIDTH, 3, 1, width),       # SHORT, inline
        (_TIFF_TAG_HEIGHT, 3, 1, height),     # SHORT, inline
        (_TIFF_TAG_MAKE, 2, len(make), None), # ASCII, by offset
        (_TIFF_TAG_ORIENTATION, 3, 1, orientation),
    ]
    if has_gps:
        entries.append((_TIFF_TAG_GPS_IFD, 4, 1, 0))  # pointer patched below
    entries.sort()  # TIFF requires ascending tag order
    n = len(entries)
    ifd_start = 8
    data_start = ifd_start + 2 + n * 12 + 4
    make_off = data_start
    gps_ifd_off = make_off + len(make)
    out = struct.pack("<2sHI", b"II", 42, ifd_start)
    out += struct.pack("<H", n)
    for tag, typ, cnt, val in entries:
        if tag == _TIFF_TAG_MAKE:
            out += struct.pack("<HHII", tag, typ, cnt, make_off)
        elif tag == _TIFF_TAG_GPS_IFD:
            out += struct.pack("<HHII", tag, typ, cnt, gps_ifd_off)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    out += make
    if has_gps:
        # GPS IFD with one SHORT GPSVersionID-ish entry
        out += struct.pack("<H", 1) + struct.pack("<HHII", 0, 3, 1, 2) + struct.pack("<I", 0)
    return out


def parse_exif(payload: bytes) -> dict:
    """Walk the TIFF structure: endianness from the header, IFD0 entry
    table, inline SHORT/LONG values vs offset-stored ASCII, GPS sub-IFD
    presence.  Unknown tags are skipped (forward compatibility)."""
    import struct

    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        return {"width": None, "height": None, "orientation": None,
                "make": None, "has_gps": False}
    lt = payload[:2] == b"II"
    e = "<" if lt else ">"
    magic, ifd_off = struct.unpack_from(e + "HI", payload, 2)
    if magic != 42:
        return {"width": None, "height": None, "orientation": None,
                "make": None, "has_gps": False}
    (n,) = struct.unpack_from(e + "H", payload, ifd_off)
    out = {"width": None, "height": None, "orientation": None,
           "make": None, "has_gps": False}
    for i in range(n):
        tag, typ, cnt, raw = struct.unpack_from(
            e + "HHII", payload, ifd_off + 2 + i * 12
        )
        if typ == 3:  # SHORT: value lives in the first 2 bytes of the field
            val = raw & 0xFFFF if lt else raw >> 16
        else:
            val = raw
        if tag == _TIFF_TAG_WIDTH:
            out["width"] = int(val)
        elif tag == _TIFF_TAG_HEIGHT:
            out["height"] = int(val)
        elif tag == _TIFF_TAG_ORIENTATION:
            out["orientation"] = int(val)
        elif tag == _TIFF_TAG_MAKE and typ == 2:
            out["make"] = payload[raw : raw + cnt].rstrip(b"\x00").decode(
                "ascii", "replace"
            )
        elif tag == _TIFF_TAG_GPS_IFD:
            out["has_gps"] = True
    return out


_EXIF_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("orientation", IntegerType()),
        StructField("make", StringType()),
        StructField("has_gps", BooleanType()),
    ]
)


def extract_exif(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                rec = parse_exif(bytes(payload))
                rows.append((int(mid), rec["width"], rec["height"],
                             rec["orientation"], rec["make"], rec["has_gps"]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "orientation",
                         "make", "has_gps"],
            )

    return media.mapInPandas(kernel, _EXIF_SCHEMA)


@query(
    "multimodal_exif_metadata",
    oracle="""
SELECT doc_id AS media_id,
       CAST(1 + doc_id % 512 AS INT) AS width,
       CAST(1 + doc_id % 384 AS INT) AS height,
       CAST(1 + doc_id % 8 AS INT) AS orientation,
       'cam' || CAST(doc_id % 10 AS VARCHAR) AS make,
       (doc_id % 4 = 0) AS has_gps
FROM documents
""",
)
def multimodal_exif_metadata(spark, sf_dir: str) -> DataFrame:
    """Plant spec-shaped TIFF/EXIF blobs (little-endian, ASCII-by-offset
    Make, conditional GPS sub-IFD) from every doc_id, then extract metadata
    with the real IFD walk.  `has_gps` is the PII flag a curation pipeline
    filters or strips on.  Scan-side Arrow kernel, zero shuffle."""
    from moosestack_spark.tables import t as _t

    d = _t(spark, sf_dir, "documents").select("doc_id")

    def plant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": [encode_exif(int(x)) for x in pdf["doc_id"]],
                }
            )

    media = d.mapInPandas(
        plant,
        StructType(
            [StructField("media_id", LongType()), StructField("payload", BinaryType())]
        ),
    )
    return extract_exif(media)


# --------------------------------------------------------------------------
# FLAC audio (ops/flac.py): real compressed-audio decode in the pipeline.
# --------------------------------------------------------------------------

FLAC_N = 1024
FLAC_RATE = 22050


@query(
    "multimodal_flac_features",
    oracle=f"""
WITH aud AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
ts AS (SELECT UNNEST(generate_series(0, {FLAC_N - 1})) AS t),
dec AS (
  SELECT doc_id, ((doc_id * 13 + t * 7) % 4001) - 2000 AS sample
  FROM aud CROSS JOIN ts
)
SELECT doc_id AS media_id,
       CAST({FLAC_N} AS BIGINT) AS n_samples,
       CAST({FLAC_RATE} AS BIGINT) AS rate,
       CAST(CAST(SUM(sample) AS BIGINT) AS DOUBLE) / {FLAC_N} AS mean_amp,
       CAST(MAX(ABS(sample)) AS INTEGER) AS peak_amp
FROM dec GROUP BY doc_id
""",
)
def multimodal_flac_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC round-trip in the distributed pipeline: deterministic
    int16 samples per doc are FLAC-encoded (four frames cycling
    fixed2/lpc2/verbatim/fixed1 subframes — every decoder path), decoded
    back through the full rice+prediction layer, and reduced to integer
    features.  FLAC is lossless, so the oracle replays the generator
    arithmetic directly (same policy as the PNG/G.711 gates)."""
    from moosestack_spark.ops.flac import decode_flac, encode_flac
    from moosestack_spark.tables import t as _t

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 97 == 0
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tt = np.arange(FLAC_N, dtype=np.int64)
        for pdf in batches:
            out = {
                "media_id": [], "n_samples": [], "rate": [],
                "mean_amp": [], "peak_amp": [],
            }
            for did in pdf["doc_id"]:
                did = int(did)
                src = (((did * 13 + tt * 7) % 4001) - 2000).astype(np.int16)
                payload = encode_flac(
                    src, FLAC_RATE, block_size=256,
                    modes=("fixed2", "lpc2", "verbatim", "fixed1"),
                )
                dec, rate = decode_flac(payload)
                s64 = dec[:, 0].astype(np.int64)
                out["media_id"].append(did)
                out["n_samples"].append(int(len(s64)))
                out["rate"].append(int(rate))
                out["mean_amp"].append(float(s64.sum()) / FLAC_N)
                out["peak_amp"].append(int(np.abs(s64).max()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        kernel,
        StructType(
            [
                StructField("media_id", LongType(), False),
                StructField("n_samples", LongType(), False),
                StructField("rate", LongType(), False),
                StructField("mean_amp", DoubleType(), False),
                StructField("peak_amp", IntegerType(), False),
            ]
        ),
    )


# --------------------------------------------------------------------------
# WebP lossless (ops/webp.py): real VP8L round-trip in the pipeline.
# --------------------------------------------------------------------------

_WEBP_MAX_PX = 16 * 12  # widest (16) x tallest (12) generator image


@query(
    "multimodal_webp_features",
    oracle=f"""
WITH img AS (
  SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 7 AS h
  FROM documents WHERE doc_id % 13 = 0
),
ts AS (SELECT UNNEST(generate_series(0, {_WEBP_MAX_PX - 1})) AS i),
px AS (
  SELECT doc_id, w, h, i
  FROM img CROSS JOIN ts WHERE i < w * h
)
SELECT doc_id AS media_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(SUM((doc_id + 3 * i) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((2 * doc_id + 5 * i) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((3 * doc_id + 7 * i) % 256) AS BIGINT) AS sum_b
FROM px GROUP BY doc_id, w, h
""",
)
def multimodal_webp_features(spark, sf_dir: str) -> DataFrame:
    """REAL WebP (VP8L lossless) round-trip in the distributed pipeline:
    deterministic RGB pixels per doc are VP8L-encoded — the transform
    (none / subtract-green / predictor / cross-color / palette) cycles
    with doc_id,
    color cache and LZ77 run references toggle too, so every decoder path
    runs — then decoded back through the full prefix-code machinery and
    reduced to integer channel sums.  VP8L is lossless, so the oracle
    replays the generator arithmetic directly (same policy as the
    PNG/FLAC/G.711 gates).  Scan-side Arrow kernel, zero shuffle."""
    from moosestack_spark.ops.webp import decode_webp, encode_webp_lossless
    from moosestack_spark.tables import t as _t

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") % 13 == 0
    )
    # every gate image has w*h <= 192 < 256 distinct colors, so the
    # palette (color-indexing) transform is always legal in the cycle
    transforms = ["none", "subtract_green", "predictor", "color", "palette"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "width": [], "height": [],
                "sum_r": [], "sum_g": [], "sum_b": [],
            }
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = 8 + did % 9, 6 + did % 7
                i = np.arange(w * h, dtype=np.int64)
                src = np.stack(
                    [
                        (did + 3 * i) % 256,
                        (2 * did + 5 * i) % 256,
                        (3 * did + 7 * i) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8).reshape(h, w, 3)
                payload = encode_webp_lossless(
                    src,
                    transform=transforms[did % 5],
                    predictor_mode=1 + did % 13,
                    cache_bits=4 if did % 2 else 0,
                    use_lz77=(did % 3 == 0),
                )
                dec = decode_webp(payload).astype(np.int64)
                out["media_id"].append(did)
                out["width"].append(int(dec.shape[1]))
                out["height"].append(int(dec.shape[0]))
                out["sum_r"].append(int(dec[:, :, 0].sum()))
                out["sum_g"].append(int(dec[:, :, 1].sum()))
                out["sum_b"].append(int(dec[:, :, 2].sum()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        kernel,
        StructType(
            [
                StructField("media_id", LongType(), False),
                StructField("width", IntegerType(), False),
                StructField("height", IntegerType(), False),
                StructField("sum_r", LongType(), False),
                StructField("sum_g", LongType(), False),
                StructField("sum_b", LongType(), False),
            ]
        ),
    )
