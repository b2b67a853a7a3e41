"""Perceptual image hashing (difference hash) + hamming near-dup pairs.

Beyond-reference operator family (brief-driven; SURVEY.md §8): image-level
near-duplicate detection for multimodal training corpora.  The classic
pipeline (pHash/aHash/dHash -> hamming-distance bucketing) re-expressed
Spark-first:

- the hash kernel really DECODES the image payload (ops/multimodal.py BMP
  codec) inside an Arrow mapInPandas batch and computes a 56-bit
  **difference hash**: 8x8 grid of block-luminance sums, bit set when the
  right neighbor's sum exceeds the block's (7 comparisons x 8 rows).
  Equal-size blocks make sum-compare == mean-compare, so the whole hash is
  EXACT integer arithmetic — which is why the gate query can be oracled
  (DuckDB replays the gradient-pixel arithmetic down to the same bigint);
- near-dup pairs: split the 56-bit hash into 4 bands of 14 bits; by
  pigeonhole any pair within hamming distance 3 agrees on at least one
  band, so candidates come from equality joins on (band_idx, band_value)
  — never an all-pairs product — and are verified with an exact
  bit_count(xor) <= 3.

Scale: hashing is a narrow Arrow kernel over the media table (no shuffle);
the pair stage shuffles once on the band key (4 rows per image), and the
verify runs inside the bucket join.  The same banding bounds candidates at
any corpus size — identical structure to the SimHash path in ops/dedup.py
(band count trades recall radius for bucket size).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query

GRID = 8  # 8x8 block grid
BITS = GRID * (GRID - 1)  # 56: 7 horizontal comparisons per row
BANDS = 4
BAND_BITS = BITS // BANDS  # 14
MAX_DIST = BANDS - 1  # pigeonhole-complete radius for 4 bands


def dhash_images(media: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """(id, dhash bigint) for every decodable image payload: decode ->
    8x8 block sums over the R channel -> 56-bit horizontal difference
    hash.  Arrow-batched; images that fail to decode are dropped."""
    from moosestack_spark.ops.multimodal import decode_image

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                px = decode_image(bytes(payload), strict=False)
                if px is None:
                    continue
                h, w = px.shape[0], px.shape[1]
                if h % GRID or w % GRID:
                    continue
                r = px[:, :, 0].astype(np.int64)
                sums = r.reshape(GRID, h // GRID, GRID, w // GRID).sum(axis=(1, 3))
                bits = (sums[:, 1:] > sums[:, :-1]).astype(np.int64)
                weights = (1 << np.arange(BITS, dtype=np.int64)).reshape(GRID, GRID - 1)
                ids.append(int(mid))
                hashes.append(int((bits * weights).sum()))
            yield pd.DataFrame({"media_id": ids, "dhash": pd.array(hashes, dtype="int64")})

    return media.mapInPandas(kernel, "media_id long, dhash long")


_BLOCKS_CTE = """
img AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 0),
grid AS (
  SELECT x.x, y.y
  FROM (SELECT UNNEST(generate_series(0, 31)) AS x) x
  CROSS JOIN (SELECT UNNEST(generate_series(0, 15)) AS y) y
),
blocks AS (
  SELECT doc_id, x // 4 AS bx, y // 2 AS by,
         CAST(SUM((doc_id + x + y) % 256) AS BIGINT) AS s
  FROM img CROSS JOIN grid GROUP BY doc_id, x // 4, y // 2
),
bits AS (
  SELECT a.doc_id, a.by, a.bx,
         CASE WHEN b.s > a.s THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
  FROM blocks a JOIN blocks b
    ON a.doc_id = b.doc_id AND a.by = b.by AND b.bx = a.bx + 1
  WHERE a.bx < 7
),
hashes AS (
  SELECT doc_id AS media_id,
         CAST(SUM(bit << (by * 7 + bx)) AS BIGINT) AS dhash
  FROM bits GROUP BY doc_id
)
"""


@query(
    "multimodal_image_dhash",
    oracle=f"WITH {_BLOCKS_CTE} SELECT media_id, dhash FROM hashes",
)
def multimodal_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """56-bit difference hash of every image in the media table, through
    the REAL BMP decode.  The oracle replays the gradient-pixel arithmetic
    ((doc_id + x + y) % 256) to the exact same bigint — a single flipped
    bit anywhere in decode or hashing fails the hash compare."""
    from moosestack_spark.ops.multimodal import media_from_documents

    media = media_from_documents(spark, sf_dir).filter(
        F.col("meta.media_type") == "image"
    )
    return dhash_images(media)


@query(
    "dedup_image_dhash_pairs",
    oracle=f"""
WITH {_BLOCKS_CTE}
SELECT bit_count(xor(a.dhash, b.dhash)) AS dist,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM hashes a JOIN hashes b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {MAX_DIST}
GROUP BY dist
""",
)
def dedup_image_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs within hamming distance {MAX_DIST},
    found via band-bucket equality joins (4 x 14-bit bands; pigeonhole
    makes recall EXACT at this radius), verified with bit_count(xor).
    Output: pair counts per distance — the dedup planner's signal.

    The DuckDB oracle uses the brute-force all-pairs join (fine at gate
    SF); the Spark side never forms the product."""
    from moosestack_spark.ops.multimodal import media_from_documents

    media = media_from_documents(spark, sf_dir).filter(
        F.col("meta.media_type") == "image"
    )
    hashes = dhash_images(media)
    bands = hashes.select(
        "media_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("dhash"), i * BAND_BITS)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for i in range(BANDS)
                ]
            )
        ).alias("band"),
    ).select("media_id", "dhash", "band.band_idx", "band.band_val")
    a = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("dhash").alias("h_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("dhash").alias("h_b"),
        "band_idx",
        "band_val",
    )
    pairs = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
        .withColumn("dist", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .filter(F.col("dist") <= MAX_DIST)
    )
    return pairs.groupBy("dist").agg(F.count(F.lit(1)).alias("n_pairs"))
