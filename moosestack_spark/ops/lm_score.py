"""Unigram language-model document scoring (perplexity proxy).

Beyond-reference operator family (SURVEY.md §8).  CCNet/RedPajama-style
pipelines score documents with a language model's per-token log-probability
and drop the tails.  The container has no KenLM, but the distributed
SKELETON is identical for any n-gram LM: (1) one aggregation pass builds
the model (here: corpus unigram counts), (2) a model-join pass scores every
document.  ops/corpus.py's bigram-rarity is the integer-exact ranking
variant; this operator surfaces the actual avg-log2-prob number a quality
threshold would be set on.

Scale: pass 1 is one groupBy(token) with map-side combine; pass 2 re-joins
tokens to the model — the model table is vocabulary-sized (tiny vs corpus),
so it BROADCASTS, making pass 2 shuffle-free except the final per-doc
groupBy.  A 100 TB corpus with a huge vocab caps the model at the top-K
tokens + an OOV bucket (standard practice), keeping the broadcast bounded.

Float determinism: counts and totals are exact integers; each token
contributes log2(count) (integer argument).  Cross-engine log2 differs in
the last ulp, and the per-doc sum is accumulation-ordered — both effects
are ~1e-13 relative, absorbed by surfacing the score as FLOAT (float32),
same policy as operators/aggregates_stats.py agg_entropy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.ops.text import tokens
from moosestack_spark.tables import t


@query(
    "text_unigram_logprob",
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
),
model AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
),
total AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM model)
SELECT tok.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(log2(CAST(m.c AS DOUBLE))) / COUNT(*)
            - log2(CAST(total.n AS DOUBLE)) AS FLOAT) AS avg_logprob
FROM tok JOIN model m ON tok.w = m.w, total
GROUP BY tok.doc_id, total.n
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram log2-probability under the corpus's own
    unigram model: avg(log2(count(w))) - log2(total_tokens).  Low scores =
    rare-token-heavy outlier documents (the perplexity-filter signal).
    The model join broadcasts (vocabulary-sized); the whitespace tokenizer
    is shared with every other text operator (ops/text.py tokens)."""
    d = t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("w"))
    model = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = model.agg(F.sum("c").cast("bigint").alias("n"))
    scored = (
        tok.join(F.broadcast(model), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.log2(F.col("c").cast("double"))).alias("sum_log"),
        )
        .join(F.broadcast(total))
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("sum_log") / F.col("n_tokens")
                - F.log2(F.col("n").cast("double"))
            )
            .cast("float")
            .alias("avg_logprob"),
        )
    )
    return scored
