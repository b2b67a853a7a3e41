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

# --------------------------------------------------------------------------
# fastText-style hashed linear classifier (inference)
# --------------------------------------------------------------------------

# feature-hashing dimensionality and the deterministic "trained" weight
# table: weight(b) = ((b * KNUTH) % 1000 - 500) / 1024.  The /1024 makes
# every weight a dyadic rational, so per-document weight SUMS are exact and
# accumulation-order-independent — the whole score pipeline is integer
# arithmetic until the final sigmoid (surfaced as FLOAT per the
# transcendental determinism policy).
_HASH_DIM = 1024
_KNUTH = 2654435761

# polynomial rolling hash over character codes, mod a Mersenne-ish prime —
# spelled with the same left fold in Spark (aggregate) and DuckDB
# (list_reduce over a 0-prepended list)
_SPARK_TOK_HASH = (
    "aggregate(transform(split(tok, ''), c -> cast(ascii(c) as bigint)), "
    "0L, (a, b) -> (a * 31 + b) % 2147483647)"
)
_DUCK_TOK_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split_regex(tok, ''), c -> CAST(ascii(c) AS BIGINT))), "
    "(a, b) -> (a * 31 + b) % 2147483647)"
)


@query(
    "text_hashed_classifier",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id,
         list_transform(string_split_regex(trim(lower(text)), '\s+'),
                        tok -> (({_DUCK_TOK_HASH} % {_HASH_DIM})
                                * {_KNUTH}) % 1000 - 500) AS ws
  FROM documents
), scored AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_tokens,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ws),
                          (a, b) -> a + b) AS BIGINT) AS wsum
  FROM tok
)
SELECT doc_id, n_tokens,
       CAST(1 / (1 + exp(-(CAST(wsum AS DOUBLE) / ({_HASH_DIM}.0 * n_tokens))))
            AS FLOAT) AS score,
       (CAST(wsum AS DOUBLE) >= 0) AS keep
FROM scored
""",
)
def text_hashed_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed bag-of-words linear classifier INFERENCE over
    documents: tokens feature-hash into 1024 buckets (character-level
    polynomial hash — the same fold runs in both engines), each bucket
    carries a fixed weight, the mean-pooled activation goes through a
    sigmoid, and `keep` thresholds at 0.5 (decided on the EXACT integer
    weight sum, not the float score).  This is the quality-classifier
    stage of CCNet/fastText-filter pipelines with the trained weight table
    replaced by a deterministic function of the bucket index — swapping in
    real weights is a broadcast 1024-float array, same plan.

    Scale: pure JVM expression pipeline — tokenize, per-token hash fold,
    integer sum — zero exchanges, no UDF; the weight "lookup" is
    arithmetic, so nothing ships to executors at all.
    """
    d = t(spark, sf_dir, "documents")
    ws = F.expr(
        f"transform(split(trim(lower(text)), '\\\\s+'), "
        f"tok -> (({_SPARK_TOK_HASH} % {_HASH_DIM}) * {_KNUTH}) % 1000 - 500)"
    )
    return (
        d.select("doc_id", ws.alias("ws"))
        .select(
            "doc_id",
            F.size("ws").cast("bigint").alias("n_tokens"),
            F.expr("aggregate(ws, 0L, (a, b) -> a + b)").alias("wsum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (
                F.lit(1.0)
                / (
                    F.lit(1.0)
                    + F.exp(
                        -(
                            F.col("wsum").cast("double")
                            / (F.lit(float(_HASH_DIM)) * F.col("n_tokens"))
                        )
                    )
                )
            )
            .cast("float")
            .alias("score"),
            (F.col("wsum").cast("double") >= 0).alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# Readability scoring (Flesch reading-ease shape).  All three inputs are
# exact integer regex counts (words, sentence terminators, vowel groups as
# the classic syllable proxy), so the score is plain arithmetic over
# identical operands — hash-exact DOUBLE, no FLOAT downcast needed.
# Zero-exchange JVM projection; quality pipelines threshold on it next to
# the Gopher/C4 signals.
# --------------------------------------------------------------------------


@query(
    "text_readability",
    oracle=r"""
SELECT doc_id, n_words, n_sentences, n_syllables,
       206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) AS flesch
FROM (
  SELECT doc_id,
         GREATEST(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT),
                  1) AS n_words,
         GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
           AS n_sentences,
         GREATEST(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                       AS BIGINT), 1) AS n_syllables
  FROM documents
)
""",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document: 206.835 - 1.015*(words/sentences)
    - 84.6*(syllables/words), with vowel groups as the syllable proxy and
    all counts floored at 1 (empty-text guard)."""
    d = t(spark, sf_dir, "documents")
    n_words = F.greatest(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint"), F.lit(1)
    )
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("bigint"), F.lit(1)
    )
    n_syl = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")).cast("bigint"),
        F.lit(1),
    )
    out = d.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    )
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (
            F.lit(206.835)
            - F.lit(1.015)
            * (F.col("n_words").cast("double") / F.col("n_sentences"))
            - F.lit(84.6)
            * (F.col("n_syllables").cast("double") / F.col("n_words"))
        ).alias("flesch"),
    )


# --------------------------------------------------------------------------
# Quality-signal ensemble: the keep/drop verdict a curation pipeline
# actually acts on, combining three independent oracled signals (hashed
# classifier vote, readability band, length band) into per-document flags
# and a final verdict — composed as ONE zero-exchange projection (each
# signal is plain arithmetic; the ensemble adds no operator cost).
# --------------------------------------------------------------------------


@query(
    "corpus_quality_ensemble",
    oracle=rf"""
WITH sig AS (
  SELECT doc_id,
    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(string_split_regex(trim(lower(text)), '\s+'),
        tok -> (({_DUCK_TOK_HASH} % {_HASH_DIM}) * {_KNUTH}) % 1000 - 500)),
      (a, b) -> a + b) AS BIGINT) AS wsum,
    GREATEST(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT), 1)
      AS n_words,
    GREATEST(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
      AS n_sentences,
    GREATEST(CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT), 1) AS n_syllables
  FROM documents
), flags AS (
  SELECT doc_id,
    wsum >= 0 AS clf_ok,
    (206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
      BETWEEN 0 AND 120 AS read_ok,
    n_words BETWEEN 5 AND 10000 AS len_ok
  FROM sig
)
SELECT doc_id, clf_ok, read_ok, len_ok,
       (clf_ok AND read_ok AND len_ok) AS keep
FROM flags
""",
)
def corpus_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop verdict from three oracled signals: the
    hashed-classifier integer vote, the Flesch readability band [0, 120],
    and a 5..10000-word length band.  The verdict and each flag gate
    hash-exact (classifier sum is exact integer; readability compares
    identical doubles)."""
    d = t(spark, sf_dir, "documents")
    ws = F.expr(
        f"transform(split(trim(lower(text)), '\\\\s+'), "
        f"tok -> (({_SPARK_TOK_HASH} % {_HASH_DIM}) * {_KNUTH}) % 1000 - 500)"
    )
    n_words = F.greatest(
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint"), F.lit(1)
    )
    n_sent = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"[.!?]+")).cast("bigint"), F.lit(1)
    )
    n_syl = F.greatest(
        F.regexp_count(F.lower(F.col("text")), F.lit(r"[aeiouy]+")).cast("bigint"),
        F.lit(1),
    )
    sig = d.select(
        "doc_id",
        F.expr(
            "aggregate(%s, 0L, (a, b) -> a + b)"
            % (
                f"transform(split(trim(lower(text)), '\\\\s+'), "
                f"tok -> (({_SPARK_TOK_HASH} % {_HASH_DIM}) * {_KNUTH}) % 1000 - 500)"
            )
        ).alias("wsum"),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (F.col("n_words").cast("double") / F.col("n_sentences"))
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / F.col("n_words"))
    )
    flags = sig.select(
        "doc_id",
        (F.col("wsum") >= 0).alias("clf_ok"),
        flesch.between(0, 120).alias("read_ok"),
        F.col("n_words").between(5, 10000).alias("len_ok"),
    )
    return flags.select(
        "doc_id",
        "clf_ok",
        "read_ok",
        "len_ok",
        (F.col("clf_ok") & F.col("read_ok") & F.col("len_ok")).alias("keep"),
    )


# --------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling" — public method).  Documents
# are scored by the log-likelihood ratio of a TARGET distribution vs the
# RAW corpus distribution over hashed n-gram buckets; high weights = "looks
# like the target data".  Real pipelines resample by these weights; the
# deterministic keep rule there is hash-mod (corpus_temperature_sample's
# trick) — here the gate surfaces the weights themselves, the number a
# curation threshold is set on.
#
# Scale: two bucket-count aggregations (map-side combined, output is
# HASH_DIM rows each), one broadcast of the 1024-row log-ratio table, one
# per-doc aggregate — the corpus is scanned twice and shuffled only by the
# tiny bucket/doc keys.  Float policy: the log-ratio is four log2 terms
# with INTEGER arguments computed once per bucket; per-doc averages surface
# as FLOAT (float32 absorbs cross-engine log2 last-ulp + sum ordering,
# same as text_unigram_logprob / agg_entropy).
# --------------------------------------------------------------------------


@query(
    "corpus_dsir_weights",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, lang, n_chars,
         UNNEST(list_transform(string_split_regex(trim(lower(text)), '\s+'),
                               tok -> {_DUCK_TOK_HASH} % {_HASH_DIM})) AS b
  FROM documents
),
raw_counts AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tok GROUP BY b
),
tgt_counts AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tok
  WHERE lang = 'en' AND n_chars BETWEEN 200 AND 400
  GROUP BY b
),
totals AS (
  SELECT (SELECT SUM(cr) FROM raw_counts) AS nr,
         (SELECT COALESCE(SUM(ct), 0) FROM tgt_counts) AS nt
),
model AS (
  SELECT r.b,
         log2(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE))
           - log2(CAST(totals.nt + {_HASH_DIM} AS DOUBLE))
           - log2(CAST(r.cr + 1 AS DOUBLE))
           + log2(CAST(totals.nr + {_HASH_DIM} AS DOUBLE)) AS lr
  FROM raw_counts r LEFT JOIN tgt_counts t ON r.b = t.b, totals
)
SELECT tok.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(m.lr) / COUNT(*) AS FLOAT) AS dsir_weight
FROM tok JOIN model m ON tok.b = m.b
GROUP BY tok.doc_id
""",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight: avg over tokens of
    log2(p_target(bucket) / p_raw(bucket)) with add-1 smoothing over
    HASH_DIM hashed unigram buckets.  The target distribution is the
    corpus's own quality band (lang='en', 200-400 chars) — swapping in an
    external target corpus changes one input DataFrame, not the plan."""
    d = t(spark, sf_dir, "documents")
    bucket = F.expr(
        f"transform(split(trim(lower(text)), '\\\\s+'), "
        f"tok -> {_SPARK_TOK_HASH} % {_HASH_DIM})"
    )
    tok = d.select(
        "doc_id", "lang", "n_chars", F.explode(bucket).alias("b")
    )
    # BOTH distributions in one aggregation pass: count(*) and the
    # target-filtered count share the bucket shuffle (one corpus scan,
    # one exchange, instead of two of each)
    is_target = (F.col("lang") == "en") & F.col("n_chars").between(200, 400)
    counts = tok.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr"),
        F.sum(F.when(is_target, 1).otherwise(0)).cast("bigint").alias("ct"),
    )
    # corpus totals as unpartitioned window sums over the HASH_DIM-row
    # counts table — no 1-row cross join, no extra scan; the window's
    # single-partition collapse is over <= 1024 rows by construction
    from pyspark.sql import Window as W

    w = W.partitionBy()
    model = counts.select(
        "b",
        (
            F.log2((F.col("ct") + 1).cast("double"))
            - F.log2((F.sum("ct").over(w) + _HASH_DIM).cast("double"))
            - F.log2((F.col("cr") + 1).cast("double"))
            + F.log2((F.sum("cr").over(w) + _HASH_DIM).cast("double"))
        ).alias("lr"),
    )
    return (
        tok.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lr") / F.count(F.lit(1))).cast("float").alias("dsir_weight"),
        )
        .select("doc_id", F.col("n_tokens").cast("bigint").alias("n_tokens"), "dsir_weight")
    )


# --------------------------------------------------------------------------
# Bigram LM with Stupid Backoff (Brants et al. 2007, "Large Language
# Models in Machine Translation"): S(w2|w1) = c2(w1 w2)/c1(w1) when the
# bigram is attested, else 0.4 * c1(w2)/N.  The backoff actually FIRES
# here: the model trains on the 3/4 split (doc_id % 4 != 0) and scores the
# full corpus, so held-out docs hit unseen bigrams (their count is the
# exact-integer n_backoff column).  OOV words score with a count-1 floor.
#
# Scale: the bigram model is NOT broadcastable at corpus scale — the score
# join on (w1, w2) is a key-sized shuffle (standard for n-gram LMs; prune
# to top-K bigrams to bound it); the two unigram joins broadcast
# (vocabulary-sized).  Float policy: exact integer counts, log2 + ordered
# sum absorbed by the FLOAT surface (same as text_unigram_logprob).
# --------------------------------------------------------------------------


@query(
    "text_bigram_backoff_logprob",
    oracle="""
WITH lowered AS (SELECT doc_id, lower(trim(text)) AS text FROM documents),
words AS (SELECT doc_id, string_split(text, ' ') AS ws FROM lowered),
tok AS (SELECT doc_id, UNNEST(ws) AS w FROM words),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok
  WHERE doc_id % 4 != 0 GROUP BY w
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
big AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM words, UNNEST(range(1, len(ws))) AS t(i)
),
big_train AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM big
  WHERE doc_id % 4 != 0 GROUP BY w1, w2
),
scored AS (
  SELECT b.doc_id,
         CASE WHEN bt.c2 IS NOT NULL
              THEN log2(CAST(bt.c2 AS DOUBLE)) - log2(CAST(u1.c AS DOUBLE))
              ELSE log2(0.4) + log2(CAST(COALESCE(u2.c, 1) AS DOUBLE))
                   - log2(CAST(tot.n AS DOUBLE)) END AS lp,
         CASE WHEN bt.c2 IS NULL THEN 1 ELSE 0 END AS backoff
  FROM big b
  LEFT JOIN big_train bt ON b.w1 = bt.w1 AND b.w2 = bt.w2
  LEFT JOIN uni u1 ON b.w1 = u1.w
  LEFT JOIN uni u2 ON b.w2 = u2.w, tot
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(backoff) AS BIGINT) AS n_backoff,
       CAST(SUM(lp) / COUNT(*) AS FLOAT) AS avg_logprob
FROM scored GROUP BY doc_id
""",
)
def text_bigram_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average log2 Stupid-Backoff bigram probability under a
    3/4-split-trained model, plus the exact count of backoff positions."""
    from moosestack_spark.ops.corpus import word_bigrams

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("text")
    )
    tok = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    uni = (
        tok.filter(F.col("doc_id") % 4 != 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    big = word_bigrams(d, "doc_id", "text")
    big_train = (
        big.filter(F.col("doc_id") % 4 != 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    joined = (
        big.join(big_train, ["w1", "w2"], "left")
        .join(
            F.broadcast(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_w1"))),
            "w1",
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_w2"))),
            "w2",
            "left",
        )
        .join(F.broadcast(tot))
    )
    lp = F.when(
        F.col("c2").isNotNull(),
        F.log2(F.col("c2").cast("double")) - F.log2(F.col("c_w1").cast("double")),
    ).otherwise(
        F.log2(F.lit(0.4))
        + F.log2(F.coalesce(F.col("c_w2"), F.lit(1)).cast("double"))
        - F.log2(F.col("n").cast("double"))
    )
    backoff = F.when(F.col("c2").isNull(), 1).otherwise(0)
    return joined.select("doc_id", lp.alias("lp"), backoff.alias("backoff")).groupBy(
        "doc_id"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum("backoff").cast("bigint").alias("n_backoff"),
        (F.sum("lp") / F.count(F.lit(1))).cast("float").alias("avg_logprob"),
    )
