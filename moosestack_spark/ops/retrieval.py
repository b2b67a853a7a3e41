"""Ranked text retrieval: tf-idf scoring with exact integer internals.

Beyond-reference operator (SURVEY.md §8): a training-data pipeline
retrieves documents by keyword relevance constantly (targeted corpus
slices, eval-set curation, nearest-text sanity checks for embedding
neighbors).  The reference has no text-retrieval surface; this implements
the tf-idf ranking family in the engine's determinism discipline: all
intermediate arithmetic is exact integers, and the ONLY float is a final
single division of two exact bigints — so the score hash-matches a SQL
replay bit-for-bit (same policy as corpus_dsir_weights).

Scoring: for query terms T, score(d) = Σ_t tf(t,d) · N / df(t) — the
idf-weighted term-frequency core of tf-idf/BM25 without the log (the log
is monotone per-term, and cross-engine libm differences would break the
hash gate; rankings on N/df agree with log(N/df) for single-term
dominance, and the docstring is explicit that this is the exact-rational
variant).  To keep the sum exact WITHOUT overflow, each term's weight is
the fixed-point integer (N·SCORE_SCALE) div df (a product of df's as a
common denominator overflows int64 at ~2M-doc df's); the numerator sum
is exact bigint and the ONLY float is the final division by SCORE_SCALE.
Bound: tf·N·SCORE_SCALE must stay under 2^63 — guarded in-plan with
raise_error at N > 2^31 (raise SCORE_SCALE down for larger corpora).

Scale design (100 TB): the per-term document frequencies are a tiny
aggregate (|T| rows) broadcast to the scan; tf counting is a JVM
projection over the exploded terms filtered to T BEFORE the shuffle
(α-selective), one groupBy(doc) shuffle, then a rank-window top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

QUERY_TERMS = ("scan", "merge", "vector")
TOP_K = 20
SCORE_SCALE = 10**6


def tfidf_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k: int = 10,
) -> DataFrame:
    """Top-k documents for ``terms`` by exact-rational tf-idf (see module
    docstring).  Returns (id, score, hits) with hits = matched distinct
    terms; ties break on id asc for total determinism."""
    spark = docs.sparkSession
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w").isin(*terms))
    n_docs = docs.select(F.count(F.lit(1)).alias("N"))
    # fixed-point idf weight per term: (N*SCORE_SCALE) div df — exact
    # bigint, overflow-guarded in-plan (the |terms|-row frame makes the
    # guard free)
    df_t = (
        words.groupBy("w")
        .agg(F.count_distinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "w",
            F.expr(
                f"CASE WHEN N > 2147483647 THEN "
                f"raise_error('tfidf_topk: corpus too large for exact "
                f"integer scoring at SCORE_SCALE={SCORE_SCALE}; lower the "
                f"scale') ELSE (N * {SCORE_SCALE}L) div df END"
            ).alias("idf_fp"),
        )
    )
    tf = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("tf") * F.col("idf_fp")).cast("bigint").alias("num"),
            F.count(F.lit(1)).alias("hits"),
        )
        .select(
            id_col,
            (F.col("num").cast("double") / float(SCORE_SCALE)).alias("score"),
            "hits",
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


@query(
    "text_tfidf_retrieval",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), hit AS (
  SELECT doc_id, w FROM words
  WHERE w IN ('scan', 'merge', 'vector')
), dfs AS (
  SELECT w, COUNT(DISTINCT doc_id) AS df FROM hit GROUP BY w
), nd AS (SELECT COUNT(*) AS N FROM documents),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM hit GROUP BY doc_id, w
), scored AS (
  SELECT tf.doc_id,
    CAST(SUM(tf.tf * ((nd.N * {SCORE_SCALE}) // dfs.df)) AS BIGINT) AS num,
    COUNT(*) AS hits
  FROM tf JOIN dfs USING (w), nd
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(num AS DOUBLE) / {SCORE_SCALE}.0 AS score,
       hits
FROM (
  SELECT *, row_number() OVER (
      ORDER BY CAST(num AS DOUBLE) / {SCORE_SCALE}.0 DESC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
""",
)
def text_tfidf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the query terms (scan, merge, vector) by
    exact-rational tf-idf.  Every intermediate is an exact bigint; the
    single final double division is identical on both engines, so even
    the DOUBLE score hash-matches."""
    d = t(spark, sf_dir, "documents")
    return tfidf_topk(d, "doc_id", "text", QUERY_TERMS, k=TOP_K)
