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
variant).  To keep the sum exact, terms are put over the COMMON
denominator D = Π_t df(t):  score = (Σ_t tf·N·D/df(t)) / D, numerator
and denominator exact bigints, one double division at the end.

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
    df_t = (
        words.groupBy("w")
        .agg(F.count_distinct(id_col).alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )
    # common denominator D = product of the matched terms' dfs (query
    # terms absent from the corpus contribute no numerator term and are
    # excluded from D on both engines)
    denom = df_t.agg(
        F.coalesce(
            F.expr("aggregate(collect_list(df), 1L, (a, b) -> a * b)"), F.lit(1)
        ).alias("D")
    )
    tf = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .crossJoin(F.broadcast(denom))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("tf") * F.col("N") * F.expr("D div df")
            ).cast("bigint").alias("num"),
            F.max("D").alias("D"),
            F.count(F.lit(1)).alias("hits"),
        )
        .select(
            id_col,
            (F.col("num").cast("double") / F.col("D").cast("double")).alias(
                "score"
            ),
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
d AS (SELECT CAST(COALESCE(product(df), 1) AS BIGINT) AS D FROM dfs),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM hit GROUP BY doc_id, w
), scored AS (
  SELECT tf.doc_id,
    CAST(SUM(tf.tf * nd.N * (d.D // dfs.df)) AS BIGINT) AS num,
    MAX(d.D) AS D, COUNT(*) AS hits
  FROM tf JOIN dfs USING (w), nd, d
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(num AS DOUBLE) / CAST(D AS DOUBLE) AS score,
       hits
FROM (
  SELECT *, row_number() OVER (ORDER BY CAST(num AS DOUBLE) / CAST(D AS DOUBLE) DESC,
                               doc_id ASC) AS rk
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
