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
