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


# ---------------------------------------------------------------------------
# BM25 (exact-rational fixed-point variant)
# ---------------------------------------------------------------------------

BM25_SCALE = 10**4  # fixed-point resolution of the per-term weight


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    terms: tuple[str, ...],
    k: int = 10,
) -> DataFrame:
    """Top-k documents for ``terms`` by the exact-rational BM25 variant.

    Classic BM25 with k1=1.2, b=0.75 written in exact tenths, idf = N/df
    (no log — the same documented policy as tfidf_topk above: logs are
    monotone per-term and libm differences would break the hash gate):

        w(t, d) = (N/df) * tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl/avgdl)

    With avgdl = L/N (L = total corpus tokens), multiplying numerator and
    denominator by 10*L clears every fraction:

        w_fp = (N * 22 * tf * L * BM25_SCALE)
               div (df * (10*tf*L + 3*L + 9*dl*N))

    — all-bigint, overflow-guarded in-plan (tf*N*L must stay under
    2^63 / (22*BM25_SCALE) ~ 4.2e13; raise_error names the fix).  The
    per-doc score sums those exact integers and divides ONCE, so the
    double hash-matches the SQL replay bit-for-bit.

    Scale shape (100 TB): doc lengths are one groupBy(doc) shuffle over
    the token explode; the per-term df frame (|terms| rows) broadcasts;
    tf rows exist only for docs containing a query term (α-selective), so
    the tf<->dl join is a keyed equi-join whose left side shrank at the
    scan; the (N, L) totals ride as a one-row broadcast cross."""
    words_all = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    )
    dl = words_all.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    hits = words_all.filter(F.col("w").isin(*terms))
    n_docs = docs.select(F.count(F.lit(1)).alias("N"))
    tot_len = dl.select(F.sum("dl").cast("bigint").alias("L"))
    nl = n_docs.crossJoin(F.broadcast(tot_len))
    df_t = hits.groupBy("w").agg(F.count_distinct(id_col).alias("df"))
    tf = hits.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("tf"))
    guard_cap = (1 << 63) // (22 * BM25_SCALE)
    scored = (
        tf.join(F.broadcast(df_t), "w")
        .join(dl, id_col)
        .crossJoin(F.broadcast(nl))
        .select(
            id_col,
            F.expr(
                f"CASE WHEN tf * N * L > {guard_cap}L THEN "
                f"raise_error('bm25_topk: corpus too large for exact "
                f"integer scoring at BM25_SCALE={BM25_SCALE}; lower the "
                f"scale') ELSE (N * 22L * tf * L * {BM25_SCALE}L) div "
                f"(df * (10L * tf * L + 3L * L + 9L * dl * N)) END"
            ).alias("w_fp"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("w_fp").cast("bigint").alias("num"),
            F.count(F.lit(1)).alias("hits"),
        )
        .select(
            id_col,
            (F.col("num").cast("double") / float(BM25_SCALE)).alias("score"),
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
    "text_bm25_retrieval",
    oracle=f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), dls AS (
  SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id
), hit AS (
  SELECT doc_id, w FROM words
  WHERE w IN ('scan', 'merge', 'vector')
), dfs AS (
  SELECT w, COUNT(DISTINCT doc_id) AS df FROM hit GROUP BY w
), nl AS (
  SELECT (SELECT COUNT(*) FROM documents) AS N,
         (SELECT SUM(dl) FROM dls) AS L
), tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM hit GROUP BY doc_id, w
), scored AS (
  SELECT tf.doc_id,
    CAST(SUM((nl.N * 22 * tf.tf * nl.L * {BM25_SCALE})
             // (dfs.df * (10 * tf.tf * nl.L + 3 * nl.L
                           + 9 * dls.dl * nl.N))) AS BIGINT) AS num,
    COUNT(*) AS hits
  FROM tf
  JOIN dfs USING (w)
  JOIN dls USING (doc_id), nl
  GROUP BY tf.doc_id
)
SELECT doc_id,
       CAST(num AS DOUBLE) / {BM25_SCALE}.0 AS score,
       hits
FROM (
  SELECT *, row_number() OVER (
      ORDER BY CAST(num AS DOUBLE) / {BM25_SCALE}.0 DESC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= {TOP_K}
""",
)
def text_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents for the query terms (scan, merge, vector) by the
    exact-rational fixed-point BM25 (k1=1.2, b=0.75, idf = N/df — see
    bm25_topk).  Length normalization makes this rank differently from
    text_tfidf_retrieval on long documents; every intermediate is an
    exact bigint, so the double score hash-matches the replay."""
    d = t(spark, sf_dir, "documents")
    return bm25_topk(d, "doc_id", "text", QUERY_TERMS, k=TOP_K)


# ---------------------------------------------------------------------------
# Per-document keyword extraction (top-k TF-IDF terms)
# ---------------------------------------------------------------------------

KW_SCALE = 10**6
KW_TOP = 3


def keyword_topk(
    docs: DataFrame, id_col: str, text_col: str, k: int = KW_TOP
) -> DataFrame:
    """(id, term, rk): each document's top-k terms by fixed-point tf-idf.

    Within one document the ranking needs only RELATIVE idf, so the weight
    is (tf * KW_SCALE) div df — no corpus-size factor, hence no one-row
    broadcast cross in the plan (unlike the retrieval scorers above).
    All-integer, ties broken by term asc: hash-replayable.  Scale shape:
    one groupBy(doc, term) for tf, one groupBy(term) for df, a keyed
    equi-join on term, one per-doc rank window."""
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = words.groupBy("term").agg(F.count_distinct(id_col).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.col("w_fp").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_t, "term")
        .select(
            id_col,
            "term",
            F.expr(f"(tf * {KW_SCALE}L) div df").alias("w_fp"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "rk")
    )


@query(
    "text_keyword_topk",
    oracle=f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 3
), words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM d
), w2 AS (
  SELECT doc_id, term FROM words WHERE term != ''
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM w2 GROUP BY doc_id, term
), dfs AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM w2 GROUP BY term
), ranked AS (
  SELECT tf.doc_id, tf.term,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY (tf.tf * {KW_SCALE}) // dfs.df DESC, tf.term ASC
         ) AS rk
  FROM tf JOIN dfs USING (term)
)
SELECT doc_id, term, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= {KW_TOP}
""",
)
def text_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf keywords per document (1/5 doc sample): the per-doc
    topic-tagging op a curation pipeline runs before mixing decisions."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 3)
    out = keyword_topk(d, "doc_id", "text", k=KW_TOP)
    return out.withColumn("rk", F.col("rk").cast("int"))
