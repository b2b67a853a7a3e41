"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline.  Expressed with
  F.aggregate / F.zip_with — JVM-side fold, no Python UDF; per (query,
  candidate) pair one sequential dot product, then per-query top-k via a
  window (partitioned by query -> scales out per query).
- LSH-bucketed (random hyperplane signs) approximate variant: the 100 TB
  path — candidates only within matching sign-buckets, then exact cosine
  re-rank inside the bucket.
- IVF-style variant: coarse centroids by hashing (deterministic stand-in for
  k-means in this container), probe nearest cells only.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a partitioned candidate scan — linear, no shuffle of candidates;
only the top-k window shuffles (queries × k rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double fold — deterministic FP."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    k: int = 10,
    query_id: str = "q_id",
    cand_id: str = "c_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x scan candidates -> window
    top-k per query.  Ties broken by candidate id (deterministic)."""
    q = queries_df.select(F.col(query_id), F.col(vec).alias("__qv"))
    c = candidates_df.select(F.col(cand_id), F.col(vec).alias("__cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .withColumn("cos_sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(cand_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, cand_id, "rnk", "cos_sim")
    )


@query(
    "similarity_bruteforce_topk",
    oracle="""
WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS c_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT q_id, c_id,
         list_dot_product(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE)),
                          LIST_TRANSFORM(cv, x -> CAST(x AS DOUBLE)))
         / (SQRT(list_dot_product(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE)),
                                  LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE))))
          * SQRT(list_dot_product(LIST_TRANSFORM(cv, x -> CAST(x AS DOUBLE)),
                                  LIST_TRANSFORM(cv, x -> CAST(x AS DOUBLE)))))
           AS cos_sim
  FROM q, c
)
SELECT q_id, c_id, rnk FROM (
  SELECT q_id, c_id,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, c_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
""",
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors for 8 probe vectors.  The gate compares ids +
    rank only (the float similarity itself stays engine-internal: FP
    accumulation order differs across engines, ranking does not)."""
    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    cs = e.select(F.col("vec_id").alias("c_id"), "embedding")
    return brute_force_topk(qs, cs, k=10, query_id="q_id", cand_id="c_id").select(
        "q_id", "c_id", "rnk"
    )


# --------------------------------------------------------------------------
# Random-hyperplane LSH buckets (approximate; rows-only driver check, recall
# verified against brute force in pytest)
# --------------------------------------------------------------------------

N_PLANES = 12


def _plane_coeffs(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash — reproducible
    across runs/engines without numpy RNG state."""
    coeffs = []
    x = (plane * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
    for i in range(dim):
        x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        coeffs.append(((x >> 8) / float(1 << 24)) * 2.0 - 1.0)
    return coeffs


def lsh_bucket(vec: Column, dim: int, n_planes: int = N_PLANES) -> Column:
    """Sign-bit bucket id from n_planes random hyperplanes (JVM arithmetic)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        coeffs = _plane_coeffs(dim, p)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def lsh_topk(
    queries_df: DataFrame,
    candidates_df: DataFrame,
    dim: int,
    k: int = 10,
    query_id: str = "q_id",
    cand_id: str = "c_id",
    vec: str = "embedding",
) -> DataFrame:
    """ANN: exact cosine re-rank restricted to candidates sharing the
    query's LSH bucket.  At scale: shuffle on bucket id co-locates each
    bucket; queries broadcast."""
    q = queries_df.select(
        F.col(query_id),
        F.col(vec).alias("__qv"),
        lsh_bucket(F.col(vec), dim).alias("__qb"),
    )
    c = candidates_df.select(
        F.col(cand_id),
        F.col(vec).alias("__cv"),
        lsh_bucket(F.col(vec), dim).alias("__cb"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("__qb") == F.col("__cb"))
        .withColumn("cos_sim", cosine(F.col("__qv"), F.col("__cv")))
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cos_sim"), F.asc(cand_id))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, cand_id, "rnk", "cos_sim")
    )


@query("similarity_lsh_bucketed")  # approximate: rows-only driver check
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    dim = 64  # embeddings table vec dim (TESTDATA.md)
    qs = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"), "embedding")
    cs = e.select(F.col("vec_id").alias("c_id"), "embedding")
    return lsh_topk(qs, cs, dim=dim, k=10).select("q_id", "c_id", "rnk")
