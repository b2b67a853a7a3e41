"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(training-data pipeline surface; not in the reference — Spark-first design
for 100 TB media corpora).

Representation: a media column is `binary` payload + a metadata struct
{media_type, width, height, sample_rate, duration_ms, codec}.  All
decode / feature-extract / resize / frame-sample operators are Pandas UDFs
over mapInPandas — Arrow-batched, schema-stable, partition-parallel.  The
actual byte decoding needs image/audio libs not present in this container,
so the decode kernel is STUBBED behind `_decode_image_bytes` /
`_decode_audio_bytes`: deterministic fakes keyed on the payload hash, with
NotImplementedError raised when `strict=True`.  The Spark-side plumbing —
schemas, batch iteration, UDF signatures, partitioning — is real and
tested (tests/test_multimodal.py).

Scale notes: media payloads dominate row size, so operators (a) never
shuffle raw bytes (feature extraction projects bytes away before any wide
op), (b) process per-partition with bounded batch memory
(spark.sql.execution.arrow.maxRecordsPerBatch caps rows per Arrow batch),
(c) frame-sampling explodes AFTER projection so only sampled frames carry
bytes downstream.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("codec", StringType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_META, False),
    ]
)


def _decode_image_bytes(payload: bytes, strict: bool = False) -> list[float]:
    """STUB decode kernel.  Real implementation: PIL/opencv decode ->
    normalized pixel tensor.  Deterministic fake: 8 floats derived from the
    payload digest (stable across runs/engines)."""
    if strict:
        raise NotImplementedError(
            "image decoding requires PIL/opencv (not in this container); "
            "the Spark plumbing around this kernel is real"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def _decode_audio_bytes(payload: bytes, strict: bool = False) -> list[float]:
    """STUB audio decode (real: soundfile/librosa -> waveform)."""
    if strict:
        raise NotImplementedError("audio decoding requires an audio lib")
    digest = hashlib.sha256(payload).digest()
    return [(b - 128) / 128.0 for b in digest[8:16]]


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """binary -> fixed-width feature vector via Arrow-batched mapInPandas.

    Output drops the payload column — bytes never cross a shuffle."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("features", ArrayType(DoubleType(), False), False),
            StructField("n_bytes", LongType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _decode_image_bytes(bytes(p), strict) for p in pdf[payload_col]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """binary audio -> waveform-feature vector (stub kernel) + duration
    passthrough, Arrow-batched.  Same no-bytes-past-this-operator contract
    as the image path."""
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("features", ArrayType(DoubleType(), False), False),
            StructField("sample_rate", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [
                        _decode_audio_bytes(bytes(p), strict) for p in pdf[payload_col]
                    ],
                    "sample_rate": pdf["sample_rate"],
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return df.select(
        id_col,
        payload_col,
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    ).mapInPandas(kernel, out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    strict: bool = False,
) -> DataFrame:
    """Stub resize: passthrough payload + updated meta dims (real kernel
    swaps in a PIL resize).  Keeps schema/meta handling honest."""
    if strict:
        raise NotImplementedError("resize requires an image lib")
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type").alias("media_type"),
            F.lit(target_w).alias("width"),
            F.lit(target_h).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_video_frames(
    df: DataFrame,
    every_ms: int,
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per sampled timestamp.  The frame
    payload extraction is stubbed (deterministic slice of the source
    payload); the explode shape — project, generate timestamps, explode,
    THEN attach frame bytes — is the real 100 TB pattern."""
    if strict:
        raise NotImplementedError("frame extraction requires ffmpeg bindings")
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)).cast("long"),
        F.lit(every_ms).cast("long"),
    )
    exploded = df.select(
        F.col(id_col),
        F.col("payload"),
        F.explode(ts).alias("frame_ms"),
    )
    # stub frame bytes: 16-byte keyed slice; real kernel decodes the frame
    frame = F.substring(F.base64(F.col("payload")), (F.col("frame_ms") % 16 + 1).cast("int"), 16)
    return exploded.select(id_col, "frame_ms", frame.alias("frame_stub"))


def make_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = hash bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append(
            (
                i,
                payload,
                {
                    "media_type": ["image", "audio", "video"][i % 3],
                    "width": 640 if i % 3 == 0 else None,
                    "height": 480 if i % 3 == 0 else None,
                    "sample_rate": 16000 if i % 3 == 1 else None,
                    "duration_ms": 2000 + i if i % 3 == 2 else None,
                    "codec": "fake",
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------------------------
# Gate queries (rows-only: binary decode kernels are stubbed, so there is no
# SQL-expressible oracle — the driver records the weaker rows/schema check;
# tests/test_multimodal.py asserts kernel determinism + plumbing).
# --------------------------------------------------------------------------


def media_from_documents(spark, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from the documents corpus: payload
    bytes are the sha2 digest chain of the text (64 bytes), metadata typed by
    doc_id.  Pure projection — distributed, no driver-side row building."""
    from moosestack_spark.tables import t as _t

    d = _t(spark, sf_dir, "documents")
    payload = F.unhex(
        F.concat(F.sha2(F.col("text"), 256), F.sha2(F.concat(F.col("text"), F.lit("x")), 256))
    )
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        mtype.alias("media_type"),
        F.when(mtype == "image", F.lit(640)).cast("int").alias("width"),
        F.when(mtype == "image", F.lit(480)).cast("int").alias("height"),
        F.when(mtype == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(mtype == "video", (F.lit(2000) + F.col("doc_id") % 1000))
        .cast("long")
        .alias("duration_ms"),
        F.lit("fake").alias("codec"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"), payload.alias("payload"), meta.alias("meta")
    )


def _register_gate_queries() -> None:
    from moosestack_spark.registry import query

    @query("multimodal_image_features")  # stubbed decode: rows-only check
    def multimodal_image_features(spark, sf_dir: str) -> DataFrame:
        media = media_from_documents(spark, sf_dir)
        imgs = media.filter(F.col("meta.media_type") == "image")
        feats = extract_image_features(imgs)
        return feats.select(
            "media_id",
            "n_bytes",
            F.size("features").alias("n_features"),
            F.round(F.element_at("features", 1), 6).alias("f0"),
        )

    @query("multimodal_frame_sample")  # stubbed frame extraction: rows-only
    def multimodal_frame_sample(spark, sf_dir: str) -> DataFrame:
        media = media_from_documents(spark, sf_dir)
        vids = media.filter(F.col("meta.media_type") == "video")
        return sample_video_frames(vids, every_ms=500)

    @query("multimodal_audio_features")  # stubbed decode: rows-only check
    def multimodal_audio_features(spark, sf_dir: str) -> DataFrame:
        media = media_from_documents(spark, sf_dir)
        auds = media.filter(F.col("meta.media_type") == "audio")
        feats = extract_audio_features(auds)
        return feats.select(
            "media_id",
            F.size("features").alias("n_features"),
            F.round(F.element_at("features", 1), 6).alias("f0"),
            "sample_rate",
        )


_register_gate_queries()
