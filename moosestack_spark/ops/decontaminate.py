"""Benchmark decontamination for training-data pipelines.

Beyond-reference operator family (SURVEY.md §8): before training, drop (or
flag) training documents that share word n-grams with an evaluation
benchmark — the standard n-gram-overlap decontamination used by public LLM
data pipelines (GPT-3 appendix C / PaLM §apdx; typically 8-13-grams).

Scale design (100 TB):
- the benchmark set is SMALL by construction (an eval suite, not a corpus):
  its distinct n-gram set is collected into a broadcast hash — the training
  side then does a broadcast semi/inner join, so the only exchange in the
  whole plan is the final per-doc groupBy.
- n-gram generation is a narrow map (split -> transform over a sequence ->
  explode); no shuffle, stays in whole-stage codegen.
- the gate query uses 3-grams so the synthetic small-vocabulary corpus
  actually produces overlaps; real pipelines pass n=8..13.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.ops.text import word_ngram_array
from moosestack_spark.registry import query
from moosestack_spark.tables import t


def word_ngrams(c: Column, n: int) -> Column:
    """Array of space-joined word n-grams; empty when the doc has < n
    words.  Shared builder (ops/text.py word_ngram_array) owns the
    short-doc sequence guard."""
    return word_ngram_array(c, n)


def contaminated_docs(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """(doc_id, n_contaminated) for every training doc sharing >=1 word
    n-gram with the benchmark set.  benchmark rows must carry text_col."""
    grams = F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    bench_grams = benchmark.select(grams).distinct()
    doc_grams = docs.select(id_col, grams)
    return (
        doc_grams.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_contaminated"))
    )


@query(
    "decontam_ngram_overlap",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS w FROM documents
),
grams AS (
  SELECT doc_id, w[i.i : i.i + 2] AS gl
  FROM toks, UNNEST(generate_series(1, LEN(w) - 2)) AS i(i)
),
g AS (SELECT doc_id, array_to_string(gl, ' ') AS g FROM grams),
bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0)
SELECT t.doc_id, COUNT(DISTINCT t.g) AS n_contaminated
FROM g t JOIN bench USING (g)
WHERE t.doc_id % 97 <> 0
GROUP BY t.doc_id
""",
)
def decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs (doc_id % 97 != 0) overlapping the 'benchmark' slice
    (doc_id % 97 == 0) on any word 3-gram."""
    d = t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return contaminated_docs(train, bench, n=3)


# --------------------------------------------------------------------------
# Embedding-space decontamination: a training doc is contaminated when its
# embedding is close (cosine >= threshold) to ANY benchmark embedding —
# catches paraphrased benchmark leakage that exact n-gram overlap misses
# (the semantic-dedup analogue of contaminated_docs).
#
# Scale shape: the benchmark matrix is eval-suite-sized, so it broadcasts
# (closure-captured numpy array, guarded by a loud count cap); candidates
# stream through ONE Arrow mapInPandas GEMM per batch — no shuffle at all
# until the (empty-by-default) aggregation of flagged ids.  Same FP-policy
# as dedup_embedding_cosine: ids + integer match counts only (pair
# membership is FP-stable; the raw cosine's last ulp is not).
# --------------------------------------------------------------------------

DECONTAM_BENCH_CAP = 100_000


def contaminated_by_embedding(
    candidates: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """(id, n_matches) for candidates with cosine >= threshold against at
    least one benchmark vector."""
    import numpy as np
    import pandas as pd

    n_bench = benchmark.count()
    if n_bench == 0:
        return candidates.sparkSession.createDataFrame(
            [], f"{id_col} long, n_matches long"
        )
    if n_bench > DECONTAM_BENCH_CAP:
        raise ValueError(
            f"benchmark set has {n_bench} vectors (> {DECONTAM_BENCH_CAP}): "
            "a broadcast GEMM against it would not be eval-suite-sized. "
            "Pre-reduce the benchmark (dedup / centroids) or raise "
            "DECONTAM_BENCH_CAP deliberately."
        )
    bench_rows = benchmark.select(vec_col).collect()
    B = np.vstack([r[0] for r in bench_rows]).astype(np.float64)
    B = B / np.linalg.norm(B, axis=1, keepdims=True)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
            V = V / np.linalg.norm(V, axis=1, keepdims=True)
            nm = (V @ B.T >= threshold).sum(axis=1)
            keep = nm > 0
            yield pd.DataFrame(
                {
                    id_col: pdf["__id"].to_numpy()[keep],
                    "n_matches": nm[keep].astype("int64"),
                }
            )

    e = candidates.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    return e.mapInPandas(kernel, f"{id_col} long, n_matches long")


@query(
    "decontam_embedding_cosine",
    oracle="""
WITH e AS (
  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
b AS (SELECT vec_id, v FROM e WHERE vec_id % 50 = 0),
c AS (SELECT vec_id, v FROM e WHERE vec_id % 50 != 0)
SELECT c.vec_id, CAST(COUNT(*) AS BIGINT) AS n_matches
FROM c JOIN b
  ON list_dot_product(c.v, b.v)
     / (SQRT(list_dot_product(c.v, c.v)) * SQRT(list_dot_product(b.v, b.v)))
     >= 0.35
GROUP BY c.vec_id
""",
)
def decontam_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates (98% split) flagged against the benchmark subset
    (vec_id % 50 == 0) at cosine >= 0.35, with exact match counts."""
    e = t(spark, sf_dir, "embeddings")
    bench = e.filter(F.col("vec_id") % 50 == 0)
    cand = e.filter(F.col("vec_id") % 50 != 0)
    return contaminated_by_embedding(
        cand, bench, "vec_id", "embedding", threshold=0.35
    )
