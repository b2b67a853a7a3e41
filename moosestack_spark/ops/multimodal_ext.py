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
    DoubleType,
    IntegerType,
    LongType,
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
