"""Corpus-level curation operators for training-data pipelines.

Brief-driven (no reference equivalent — the reference's pipelines stop at
ingest/transform; see SURVEY.md §8): the operations a 100 TB pretraining
corpus needs between raw documents and a training mix:

- weighted corpus mixing (hit target per-source proportions exactly and
  deterministically);
- word-bigram rarity scoring (an integer-exact stand-in for LM-perplexity
  filtering: documents whose n-grams are corpus-rare are outliers);
- per-document keyword extraction ((tf desc, df asc) ranking — the integer
  skeleton of tf-idf, exact across engines because no float log enters the
  ordering);
- corpus-level top n-gram stats;
- semantic dedup (SemDeDup shape: k-means cluster, then exact cosine pairs
  only WITHIN clusters — the cluster assignment bounds the quadratic blowup
  the way LSH bands do for minhash).

Determinism: every oracled query ranks and aggregates in integers (counts,
hash hex strings); doubles appear only as a final single division of exact
integers.  The semantic dedup trains MLlib KMeans (seeded) — not
SQL-expressible, so it registers rows-only with pytest soundness/recall
pins (test_corpus.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# Weighted corpus mixing.
# --------------------------------------------------------------------------

MIX_WEIGHTS = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
MIX_TOTAL = 60


def corpus_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weights: dict[str, float],
    total: int,
) -> DataFrame:
    """Deterministic weighted mix: from each source s take the
    round(weights[s] * total) documents that rank first by md5(id) — a
    hash-rank reservoir, so the same documents are chosen on any cluster
    layout or engine.  Sources outside ``weights`` are dropped.

    Scale: the rank is a window per source over the hash — with per-source
    targets in the thousands a partial top-k prune per partition (as in
    operators/aggregates.py topK) bounds the sort input; targets here are
    tiny so the plain window is the clear expression."""
    quotas = [(s, int(round(w * total))) for s, w in sorted(weights.items())]
    quota_df = df.sparkSession.createDataFrame(quotas, f"{source_col} string, __quota int")
    h = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.join(F.broadcast(quota_df), source_col)
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= F.col("__quota"))
        .drop("__rk", "__quota")
    )


@query(
    "corpus_mix_weights",
    oracle="""
WITH quotas(source, quota) AS (VALUES ('src0', 30), ('src1', 18), ('src2', 12)),
ranked AS (
  SELECT d.doc_id, d.source, q.quota,
    row_number() OVER (
      PARTITION BY d.source
      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
  FROM documents d JOIN quotas q ON d.source = q.source
)
SELECT source, doc_id FROM ranked WHERE rk <= quota
""",
)
def corpus_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mix 60 documents at 50/30/20% from three sources, chosen by hash
    rank.  The driver compares the exact membership, proving the mix is
    engine- and layout-independent."""
    d = t(spark, sf_dir, "documents")
    return corpus_mix(d, "doc_id", "source", MIX_WEIGHTS, MIX_TOTAL).select(
        "source", "doc_id"
    )


# --------------------------------------------------------------------------
# Word-bigram corpus frequencies -> per-document rarity score.
# --------------------------------------------------------------------------


def word_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode each document into its word bigrams (order-preserving).
    Pure JVM exprs: split + sequence/transform + explode, no Python."""
    ws = F.split(F.col(text_col), " ")
    pairs = F.expr(
        f"transform(sequence(1, size(split({text_col}, ' ')) - 1), "
        f"i -> struct(element_at(split({text_col}, ' '), i) AS w1, "
        f"element_at(split({text_col}, ' '), i + 1) AS w2))"
    )
    return (
        df.select(F.col(id_col), F.explode(pairs).alias("__bg"))
        .select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    )


@query(
    "text_bigram_rarity",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bigrams AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM words, UNNEST(range(1, len(ws))) AS t(i)
), cc AS (
  SELECT w1, w2, COUNT(*) AS c FROM bigrams GROUP BY w1, w2
)
SELECT b.doc_id,
  CAST(SUM(c) AS BIGINT) AS freq_sum,
  COUNT(*) AS n_bigrams,
  CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / COUNT(*) AS avg_bigram_freq
FROM bigrams b JOIN cc USING (w1, w2)
GROUP BY b.doc_id
""",
)
def text_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average corpus frequency of its word bigrams — the
    integer-exact rarity signal (low average = the document's phrasing is
    unusual for the corpus; the quality-filter counterpart of perplexity
    without a float log in sight).  Two shuffles: bigram counting (map-side
    combined) and the count join back to documents — the join key is the
    bigram, so frequency skew ('the the') is AQE-handled."""
    d = t(spark, sf_dir, "documents")
    bg = word_bigrams(d, "doc_id", "text")
    cc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    return (
        bg.join(cc, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("freq_sum"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .select(
            "doc_id",
            "freq_sum",
            "n_bigrams",
            (F.col("freq_sum").cast("double") / F.col("n_bigrams")).alias(
                "avg_bigram_freq"
            ),
        )
    )


# --------------------------------------------------------------------------
# Keyword extraction: (tf desc, df asc, word asc) — integer tf-idf skeleton.
# --------------------------------------------------------------------------


@query(
    "text_keywords_tfdf",
    oracle="""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w
), df AS (
  SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w
), ranked AS (
  SELECT tf.doc_id, tf.w, tf.tf, df.df,
    row_number() OVER (
      PARTITION BY tf.doc_id ORDER BY tf.tf DESC, df.df ASC, tf.w ASC) AS rk
  FROM tf JOIN df USING (w)
)
SELECT doc_id,
  string_agg(w, ',' ORDER BY rk) AS keywords
FROM ranked WHERE rk <= 3 GROUP BY doc_id
""",
)
def text_keywords_tfdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by (term frequency desc, document
    frequency asc, word asc).  The float-free core of tf-idf: a word beats
    another iff it is more frequent in the doc, or equally frequent but
    rarer corpus-wide — the exact ordering log-idf induces when tf ties,
    with no cross-engine float in the sort key."""
    d = t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    rk = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("w").asc()
    )
    ranked = (
        tf.join(dfreq, "w")
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= 3)
    )
    entry = F.struct(F.col("rk"), F.col("w"))
    return ranked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(entry)), lambda s: s["w"]), ","
        ).alias("keywords")
    )


# --------------------------------------------------------------------------
# Corpus-level top n-grams.
# --------------------------------------------------------------------------


@query(
    "text_top_ngrams",
    oracle="""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), trigrams AS (
  SELECT ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2] AS gram
  FROM words, UNNEST(range(1, len(ws) - 1)) AS t(i)
)
SELECT gram, COUNT(*) AS n
FROM trigrams GROUP BY gram
ORDER BY n DESC, gram ASC
LIMIT 20
""",
)
def text_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 word trigrams corpus-wide (count desc, gram asc).  One
    map-side-combined count shuffle + TakeOrdered — corpus vocabulary stats
    at any SF."""
    d = t(spark, sf_dir, "documents")
    grams = F.expr(
        "transform(sequence(1, size(split(text, ' ')) - 2), "
        "i -> concat_ws(' ', element_at(split(text, ' '), i), "
        "element_at(split(text, ' '), i + 1), "
        "element_at(split(text, ' '), i + 2)))"
    )
    return (
        d.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup shape).
# --------------------------------------------------------------------------


def _assign_top_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec: str,
    probes: int,
    out_col: str = "__cell",
) -> DataFrame:
    """Multi-probe cell assignment: each row lands in its ``probes`` nearest
    centroid cells (max cosine; numpy argsort ties break to the smaller
    centroid id).  Same zero-shuffle scan-side GEMM shape as
    ops/similarity.ivf_assign, with the row replicated per probed cell."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    cids = np.array([cid for cid, _ in centroids], dtype=np.int64)
    C = np.array([v for _, v in centroids], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    # LongType: hash_seed_centroids feeds real row ids as cids — an id
    # >= 2^31 must not wrap (the oracle keeps full-width vec_id)
    out_schema = StructType(df.schema.fields + [StructField(out_col, LongType())])

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.copy()
                out[out_col] = pd.Series([], dtype="int64")
                yield out
                continue
            V = np.vstack(pdf[vec].to_numpy()).astype(np.float64)
            cos = (V @ C.T) / np.outer(np.linalg.norm(V, axis=1), cn)
            # stable argsort on -cos: ties resolve to the smaller cid
            top = np.argsort(-cos, axis=1, kind="stable")[:, :probes]
            idx = np.repeat(np.arange(len(pdf)), probes)
            out = pdf.iloc[idx].reset_index(drop=True)
            # int64: hash_seed_centroids feeds real row ids as cids, and an
            # id >= 2^31 must not wrap (the oracle keeps full-width vec_id)
            out[out_col] = cids[top.ravel()].astype("int64")
            yield out

    return df.mapInPandas(kernel, out_schema)


def _in_cell_cosine_pairs(assigned: DataFrame, threshold: float) -> DataFrame:
    """(id_a < id_b) pairs with cosine >= threshold, compared WITHIN each
    cell by one vectorized float64 GEMM per cell (Arrow applyInPandas —
    the bucket_verify shape of ops/dedup.embedding_cosine_pairs_pruned).
    An earlier self-join spelling scored each candidate pair with an
    interpreted 64-term cosine fold — measured 14.4 s vs ~1 s for this
    kernel at sf0.1.  Pairs sharing several probed cells dedup after."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [StructField("id_a", LongType()), StructField("id_b", LongType())]
    )

    def cell_verify(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype("int64")
        order = np.argsort(pdf["__id"].to_numpy(), kind="stable")
        ids = pdf["__id"].to_numpy()[order]
        V = np.vstack(pdf["__v"].to_numpy()[order]).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1)
        out_a, out_b = [], []
        chunk = 4096
        for lo in range(0, m, chunk):
            hi = min(lo + chunk, m)
            cos = (V[lo:hi] @ V.T) / np.outer(nrm[lo:hi], nrm)
            for i in range(lo, hi):
                js = np.nonzero(cos[i - lo, i + 1 :] >= threshold)[0] + i + 1
                out_a.extend([ids[i]] * len(js))
                out_b.extend(ids[js])
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64")}
        )

    return (
        assigned.groupBy("__cell")
        .applyInPandas(cell_verify, out_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    k: int = 16,
    probes: int = 3,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine, restricted to k-means
    cluster cells: train seeded spherical centroids (bounded sample ->
    broadcast, ops/similarity.ivf_train_centroids), assign every row
    scan-side to its ``probes`` nearest cells (no shuffle), then compare
    WITHIN cells only (per-cell GEMM kernel) and distinct the pairs.  The
    cell restriction turns the O(n²) pair space into Σ|cell|² ≈
    (probes·n)²/k, and k scales with the corpus.  Multi-probe is the
    recall lever: a pair is missed only if the two rows share NONE of
    their ``probes`` nearest cells — measured here, probes=3 lifts recall
    from ~0.4 to ~0.9 at threshold 0.35 (the pytest pins soundness and
    recall vs the exact kernel at test SF)."""
    from moosestack_spark.ops.similarity import ivf_train_centroids

    e = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    centroids = ivf_train_centroids(e, vec="__v", k=k)
    assigned = _assign_top_cells(e, centroids, vec="__v", probes=probes)
    return _in_cell_cosine_pairs(assigned, threshold)


def hash_seed_centroids(
    df: DataFrame, id_col: str, vec: str, k: int
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid seeding: the k rows with the smallest
    (fmix32(id), id) — the portable murmur3 finalizer both engines replay —
    returned as (cid=row id, vector) sorted by cid ascending.  A hash-random
    draw is exactly what k-means++ uses for its first pick; using k such
    draws trades some cell balance for a fully engine-replayable cell
    structure, which is what lets the whole SemDeDup assignment carry a
    hard value-hash oracle (the Lloyd-trained path keeps its pytest-pinned
    recall gates).  Bounded driver collect: k rows."""
    from moosestack_spark.operators.aggregates import fmix32_expr

    rows = (
        df.select(id_col, vec)
        .withColumn("__h32", F.expr(fmix32_expr(id_col)))
        .orderBy("__h32", id_col)
        .limit(k)
        .collect()
    )
    return sorted((int(r[id_col]), list(r[vec])) for r in rows)


def _semantic_cluster_oracle(k: int = 16, probes: int = 3, thr: float = 0.35) -> str:
    from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes

    ctes = fmix32_duckdb_ctes("vec_id", "vec_id", "embeddings")
    return f"""
WITH e AS (
  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{ctes},
cents AS (
  SELECT e.vec_id AS cid, e.v AS cv
  FROM e JOIN hashed h ON h.vec_id = e.vec_id
  ORDER BY h.h32, e.vec_id LIMIT {k}
),
norms AS (SELECT vec_id, v, SQRT(list_dot_product(v, v)) AS nrm FROM e),
cnorms AS (SELECT cid, cv, SQRT(list_dot_product(cv, cv)) AS cnrm FROM cents),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT n.vec_id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY list_dot_product(n.v, c.cv) / (n.nrm * c.cnrm) DESC,
                      c.cid ASC
           ) AS rk
    FROM norms n CROSS JOIN cnorms c
  ) WHERE rk <= {probes}
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
FROM assign a
JOIN assign b ON a.cid = b.cid AND a.vec_id < b.vec_id
JOIN norms na ON na.vec_id = a.vec_id
JOIN norms nb ON nb.vec_id = b.vec_id
WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) >= {thr}
"""


@query("dedup_semantic_cluster", oracle=_semantic_cluster_oracle())
def dedup_semantic_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup pairs within centroid cells at cosine >= 0.35 (the
    same threshold the exact kernel gates at — the synthetic embeddings'
    cosine mass sits well below real near-dup levels).

    The gate seeds cells from DETERMINISTIC hash-selected centroids
    (fmix32-min rows, hash_seed_centroids) so the full pipeline — top-probes
    assignment with (cos DESC, cid ASC) ranking, in-cell exact cosine — is
    replayable in DuckDB and carries a hard value-hash oracle; the
    production Lloyd-trained path (semantic_dedup_pairs with
    ivf_train_centroids) shares every stage after seeding and keeps its
    soundness/recall pytest pins in test_corpus.py."""
    e = t(spark, sf_dir, "embeddings")
    ev = e.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    centroids = hash_seed_centroids(ev, "__id", "__v", k=16)
    assigned = _assign_top_cells(ev, centroids, vec="__v", probes=3)
    return _in_cell_cosine_pairs(assigned, 0.35).orderBy("id_a", "id_b")


# --------------------------------------------------------------------------
# End-to-end curation pipeline: the flagship composition query.
# --------------------------------------------------------------------------


def _pipeline_oracle() -> str:
    from moosestack_spark.ops.components import _PAIR_CTES

    pair_ctes = _PAIR_CTES.replace("FROM documents", "FROM uniq")
    return rf"""
WITH RECURSIVE kept AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE lang = 'en' AND n_chars BETWEEN 100 AND 500
),
uniq AS (
  SELECT doc_id, text, n_chars FROM (
    SELECT doc_id, text, n_chars, row_number() OVER (
      PARTITION BY regexp_replace(TRIM(LOWER(text)), '\s+', ' ', 'g')
      ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
),
{pair_ctes},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
verts AS (SELECT DISTINCT src AS v FROM edges),
reach AS (
  SELECT v, v AS r FROM verts
  UNION
  SELECT e.dst AS v, reach.r AS r FROM reach JOIN edges e ON e.src = reach.v
),
comp AS (SELECT v, MIN(r) AS cluster FROM reach GROUP BY v),
final AS (
  SELECT * FROM uniq
  WHERE doc_id NOT IN (SELECT v FROM comp WHERE v <> cluster)
),
labeled AS (
  SELECT CASE
    WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 5 THEN 'val'
    WHEN ((doc_id % 2147483648) * 2654435761) % 4294967296 % 100 < 10 THEN 'test'
    ELSE 'train'
  END AS split, n_chars
  FROM final
)
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM labeled GROUP BY split
"""


@query("corpus_curation_pipeline", oracle=_pipeline_oracle())
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE composed plan: language filter ->
    length/quality gate -> exact dedup (normalized text, min-id survivor) ->
    near-dup pruning (n-gram Jaccard pairs -> connected components, keep the
    cluster minimum) -> deterministic 90/5/5 split, reporting per-split doc
    and char totals.

    This is the query a training-data team actually ships; each stage is the
    already-gated operator (dedup_exact / dedup_ngram_jaccard /
    dedup_connected_components / text_train_val_test_split) composed in one
    lineage.  Scale shape: the filters run scan-side; exact dedup is one
    hash shuffle; the pair/CC subgraph runs on the FILTERED survivor corpus
    (each stage shrinks the next stage's input — the pipeline ordering IS
    the optimization); the split/rollup is a final tiny aggregate."""
    from moosestack_spark.ops.components import connected_components_auto
    from moosestack_spark.ops.dedup import ngram_jaccard_pairs

    d = t(spark, sf_dir, "documents")
    kept = d.filter(
        (F.col("lang") == "en") & F.col("n_chars").between(100, 500)
    ).select("doc_id", "text", "n_chars")
    w = Window.partitionBy("__norm").orderBy("doc_id")
    uniq = (
        kept.withColumn(
            "__norm",
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "text", "n_chars")
    )
    pairs = ngram_jaccard_pairs(uniq, "doc_id", "text", n=5, threshold=0.5)
    # hybrid CC: propagation converges in 2-3 rounds on the near-clique
    # clusters this graph has; a long-chain graph would contract and
    # star-finish in O(log n) rounds instead of O(diameter)
    cc = connected_components_auto(pairs, "doc_a", "doc_b")
    non_canonical = cc.filter(F.col("v") != F.col("cluster_id")).select("v")
    final = uniq.join(
        F.broadcast(non_canonical), uniq.doc_id == F.col("v"), "left_anti"
    )
    bucket = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(4294967296),
    ) % 100
    split = (
        F.when(bucket < 5, F.lit("val"))
        .when(bucket < 10, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return (
        final.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-flattened corpus sampling with an ORACLED deterministic
# sampler.  Real mixing pipelines sample source s at rate ∝ tok_s^(τ-1)
# (τ=0.5 here: sampled tokens ∝ sqrt(tok_s), flattening dominance of big
# sources).  Two determinism choices make the whole query value-hash
# exact where hash-mod samples are normally rows-only:
# - the keep decision hashes doc_id through the PORTABLE fmix32 (the same
#   finalizer the deterministic HLL uses), replayable in DuckDB;
# - the rate needs NO cross-source normalization (min(1, K/sqrt(tok_s)) —
#   sqrt/divide are correctly rounded, so both engines floor the same
#   integer threshold; a softmax-style normalizer would sum floats in
#   engine-dependent order).
# Scale: one window + one groupBy on the same source key (exchange
# reused); the keep test is per-row arithmetic.
# --------------------------------------------------------------------------

_TEMP_K = 12.0
_TEMP_MOD = 1_000_000


def _temp_sample_oracle() -> str:
    from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes

    ctes = fmix32_duckdb_ctes(
        "doc_id", "doc_id, source, ntok, tok_s", "tot"
    )
    return rf"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntok
  FROM documents
),
tot AS (
  SELECT doc_id, source, ntok,
         SUM(ntok) OVER (PARTITION BY source) AS tok_s
  FROM tok
),{ctes},
kept AS (
  SELECT source, ntok
  FROM hashed
  WHERE h32 % {_TEMP_MOD} < CAST(FLOOR(
    LEAST(1.0, {_TEMP_K!r} / sqrt(CAST(tok_s AS DOUBLE))) * {_TEMP_MOD})
    AS BIGINT)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(ntok) AS BIGINT) AS tokens_kept
FROM kept GROUP BY source
"""


@query("corpus_temperature_sample", oracle=_temp_sample_oracle())
def corpus_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source doc/token counts after temperature-flattened sampling
    (rate = min(1, K/sqrt(source_tokens)), keep decided by portable fmix32
    of doc_id) — a deterministic, fully-oracled data-mixing stage."""
    from moosestack_spark.operators.aggregates import fmix32_expr
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    tok = d.select("doc_id", "source", ntok.alias("ntok"))
    tot = tok.withColumn(
        "tok_s", F.sum("ntok").over(Window.partitionBy("source"))
    )
    rate = F.least(
        F.lit(1.0), F.lit(_TEMP_K) / F.sqrt(F.col("tok_s").cast("double"))
    )
    thresh = F.floor(rate * _TEMP_MOD).cast("bigint")
    kept = tot.withColumn("h32", F.expr(fmix32_expr("doc_id"))).filter(
        F.col("h32") % _TEMP_MOD < thresh
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("ntok").cast("bigint").alias("tokens_kept"),
    )


# --------------------------------------------------------------------------
# Weighted sampling WITHOUT replacement: priority sampling (Duffield, Lund,
# Thorup, JACM 2007).  Each doc gets priority w_i / u_i with u_i uniform in
# (0,1]; the k highest-priority docs are the sample, and max(w_i, tau) with
# tau = the (k+1)-th priority is an unbiased estimator of any subset's
# total weight — the right primitive for token-budgeted corpus subsetting
# where plain Bernoulli sampling over/undershoots the budget.
#
# Determinism: u_i = (fmix32(doc_id)+1)/2^32, so priority
# = w * 2^32 / (h32+1) — exact integer numerator (< 2^53) and denominator,
# ONE correctly-rounded IEEE division; both engines produce bit-identical
# doubles, no transcendentals (the -ln(u)/w exponential-key formulation of
# Efraimidis-Spirakis would hash-diverge on libm ulps).  Ties broken by
# doc_id.
# Scale: the top-(k+1) is Spark's TakeOrdered (per-partition partial top-k,
# no global sort shuffle); the tau window runs on k+1 rows.
# --------------------------------------------------------------------------

_PS_K = 120


def _priority_sample_oracle() -> str:
    from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes

    ctes = fmix32_duckdb_ctes("doc_id", "doc_id, ntok", "tok")
    return rf"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ntok
  FROM documents
),{ctes},
scored AS (
  SELECT doc_id, GREATEST(ntok, 1) AS w,
         CAST(GREATEST(ntok, 1) * 4294967296 AS DOUBLE) / (h32 + 1) AS priority
  FROM hashed
),
topk1 AS (
  SELECT * FROM scored ORDER BY priority DESC, doc_id LIMIT {_PS_K + 1}
),
ranked AS (
  SELECT doc_id, w, priority,
         ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rk
  FROM topk1
),
tau AS (
  SELECT COALESCE(MAX(CASE WHEN rk = {_PS_K + 1} THEN priority END), 0.0)
         AS tau
  FROM ranked
)
SELECT doc_id, CAST(w AS BIGINT) AS weight, priority,
       GREATEST(CAST(w AS DOUBLE), tau) AS est_weight
FROM ranked, tau WHERE rk <= {_PS_K}
"""


@query("corpus_priority_sample", oracle=_priority_sample_oracle())
def corpus_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted sample of {_PS_K} docs without replacement via
    priority sampling, with the unbiased max(w, tau) weight estimator —
    deterministic (portable fmix32 uniforms, division-only float path)
    and therefore hard-oracled."""
    from pyspark.sql import Window

    from moosestack_spark.operators.aggregates import fmix32_expr

    d = t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    scored = (
        d.select("doc_id", ntok.alias("ntok"))
        .withColumn("h32", F.expr(fmix32_expr("doc_id")))
        .select(
            "doc_id",
            F.greatest("ntok", F.lit(1)).alias("w"),
            (
                (F.greatest("ntok", F.lit(1)) * F.lit(4294967296)).cast(
                    "double"
                )
                / (F.col("h32") + 1)
            ).alias("priority"),
        )
    )
    topk1 = scored.orderBy(F.desc("priority"), "doc_id").limit(_PS_K + 1)
    w_rank = Window.orderBy(F.desc("priority"), F.col("doc_id"))
    ranked = topk1.select(
        "*", F.row_number().over(w_rank).alias("rk")
    )
    tau = F.coalesce(
        F.max(F.when(F.col("rk") == _PS_K + 1, F.col("priority"))).over(
            Window.partitionBy()
        ),
        F.lit(0.0),
    )
    return (
        ranked.withColumn("tau", tau)
        .filter(F.col("rk") <= _PS_K)
        .select(
            "doc_id",
            F.col("w").cast("bigint").alias("weight"),
            "priority",
            F.greatest(F.col("w").cast("double"), F.col("tau")).alias(
                "est_weight"
            ),
        )
    )


# --------------------------------------------------------------------------
# Stratified sampling with EXACT largest-remainder allocation.  Hash-mod
# sampling (corpus_temperature_sample) holds rates only in expectation;
# an eval-set builder needs exact per-stratum counts that sum to the exact
# total.  Allocation: T = N div 10 rows overall; stratum s gets
# base_s = n_s*T div N plus one extra for the (T - Σ base) largest
# remainders (ties broken by stratum key asc) — the classic
# largest-remainder method, all-integer and therefore hash-replayable.
# Row choice within a stratum is the fmix32(doc_id) order (the portable
# murmur3 finalizer both engines compute bit-identically), tie doc_id asc.
# Scale: one groupBy(lang) count, one |strata|-row allocation frame
# broadcast back, one window rank per stratum (single shuffle on lang).
# --------------------------------------------------------------------------


def stratified_sample(
    df: DataFrame, id_col: str, stratum_col: str, denom: int = 10
) -> DataFrame:
    """Exactly ``count(df) div denom`` rows, allocated across strata by
    largest remainder, chosen within each stratum by fmix32(id) order."""
    from moosestack_spark.operators.aggregates import fmix32_expr

    d = df.select(id_col, stratum_col)
    counts = d.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_s"))
    tot = d.agg(
        F.count(F.lit(1)).alias("N"),
        (F.count(F.lit(1)) / denom).cast("bigint").alias("T"),
    )
    alloc = counts.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        F.expr("(n_s * T) div N").alias("base"),
        F.expr("(n_s * T) % N").alias("rem"),
    )
    # leftover = T - sum(base), carried as a one-row broadcast
    leftover = alloc.crossJoin(F.broadcast(tot)).agg(
        (F.first("T") - F.sum("base")).cast("bigint").alias("x")
    )
    w_rem = Window.orderBy(F.col("rem").desc(), F.col(stratum_col).asc())
    quota = (
        alloc.withColumn("rk", F.row_number().over(w_rem))
        .crossJoin(F.broadcast(leftover))
        .select(
            stratum_col,
            (
                F.col("base")
                + F.when(F.col("rk") <= F.col("x"), 1).otherwise(0)
            ).alias("quota"),
        )
    )
    w_in = Window.partitionBy(stratum_col).orderBy("__h", id_col)
    return (
        d.withColumn("__h", F.expr(fmix32_expr(id_col)))
        .withColumn("rn", F.row_number().over(w_in))
        .join(F.broadcast(quota), stratum_col)
        .filter(F.col("rn") <= F.col("quota"))
        .select(id_col, stratum_col)
    )


def _stratified_oracle() -> str:
    from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes

    ctes = fmix32_duckdb_ctes("doc_id", "doc_id, lang", "documents")
    return f"""
WITH {ctes},
counts AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
tot AS (SELECT COUNT(*) AS N, COUNT(*) // 10 AS T FROM documents),
alloc AS (
  SELECT lang, (n_s * T) // N AS base, (n_s * T) % N AS rem
  FROM counts, tot
),
lo AS (
  SELECT (SELECT T FROM tot) - (SELECT SUM(base) FROM alloc) AS x
),
quota AS (
  SELECT lang,
         base + CASE WHEN row_number()
                          OVER (ORDER BY rem DESC, lang ASC) <= lo.x
                     THEN 1 ELSE 0 END AS q
  FROM alloc, lo
),
picked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h32, doc_id) AS rn
  FROM hashed
)
SELECT doc_id, lang FROM picked JOIN quota USING (lang) WHERE rn <= q
"""


@query("corpus_stratified_sample", oracle=_stratified_oracle())
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1/10 stratified sample of documents by lang: largest-remainder
    quotas (Σ quotas = N div 10 exactly), fmix32-ordered row choice inside
    each stratum — deterministic and hash-replayable end to end."""
    d = t(spark, sf_dir, "documents")
    return stratified_sample(d, "doc_id", "lang", denom=10)


# --------------------------------------------------------------------------
# Composed export report: filter -> exact dedup -> stratified 1/10 sample ->
# per-language doc/token totals, as ONE lineage.  Demonstrates that the
# gated stages COMPOSE (the curation-pipeline property) with the round-8
# exact-quota sampler in the middle; every stage is deterministic integer
# logic, so the whole composition stays hash-replayable.
# --------------------------------------------------------------------------


def _export_report_oracle() -> str:
    from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes

    ctes = fmix32_duckdb_ctes("doc_id", "doc_id, lang, text", "uniq")
    return f"""
WITH kept AS (
  SELECT doc_id, text, lang FROM documents
  WHERE lang IN ('en', 'es') AND n_chars BETWEEN 50 AND 2000
), normed AS (
  SELECT doc_id, text, lang,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS norm
  FROM kept
), uniq AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           row_number() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
    FROM normed
  ) WHERE rn = 1
), {ctes},
counts AS (SELECT lang, COUNT(*) AS n_s FROM uniq GROUP BY lang),
tot AS (SELECT COUNT(*) AS N, COUNT(*) // 10 AS T FROM uniq),
alloc AS (
  SELECT lang, (n_s * T) // N AS base, (n_s * T) % N AS rem
  FROM counts, tot
),
lo AS (
  SELECT (SELECT T FROM tot) - (SELECT SUM(base) FROM alloc) AS x
),
quota AS (
  SELECT lang,
         base + CASE WHEN row_number()
                          OVER (ORDER BY rem DESC, lang ASC) <= lo.x
                     THEN 1 ELSE 0 END AS q
  FROM alloc, lo
),
picked AS (
  SELECT doc_id, lang, text,
         row_number() OVER (PARTITION BY lang ORDER BY h32, doc_id) AS rn
  FROM hashed
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
FROM picked JOIN quota USING (lang) WHERE rn <= q
GROUP BY lang
"""


@query("corpus_export_report", oracle=_export_report_oracle())
def corpus_export_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter -> exact dedup (normalized text, min-id survivor) ->
    stratified exact-quota 1/10 sample by lang -> per-language doc and
    token totals, one composed plan.  Scale shape: scan-side filters, one
    hash shuffle for dedup, one lang shuffle for the sampler's rank
    window, a |strata|-row quota broadcast, and a final tiny aggregate —
    each stage shrinks the next stage's input."""
    d = t(spark, sf_dir, "documents")
    kept = d.filter(
        F.col("lang").isin("en", "es") & F.col("n_chars").between(50, 2000)
    ).select("doc_id", "text", "lang")
    w = Window.partitionBy("__norm").orderBy("doc_id")
    uniq = (
        kept.withColumn(
            "__norm",
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "text", "lang")
    )
    sampled = stratified_sample(uniq, "doc_id", "lang", denom=10)
    return (
        sampled.join(uniq, ["doc_id", "lang"])
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Per-domain quality-quantile filter (the FineWeb/RefinedWeb-style curation
# step: keep the best q fraction of each SOURCE, not of the global pool —
# a global cut starves low-resource domains).
# --------------------------------------------------------------------------


def domain_quality_topq(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    q: float = 0.3,
) -> DataFrame:
    """Keep the top-``q`` fraction of each domain by quality_score
    (ops/text.py), deterministic ordering (score desc, id asc), threshold
    ceil(q * domain_count) — exact integers, so the boundary doc is the
    same on every run and engine.  Scale shape: one window over the
    domain-partitioned shuffle; no collect, no second scan."""
    from moosestack_spark.ops.text import quality_score

    w = Window.partitionBy(domain_col).orderBy(
        F.col("__q").desc(), F.col(id_col).asc()
    )
    wc = Window.partitionBy(domain_col)
    scored = df.select(
        id_col, domain_col, quality_score(F.col(text_col)).alias("__q")
    )
    ranked = scored.withColumn("__rn", F.row_number().over(w)).withColumn(
        "__cnt", F.count(F.lit(1)).over(wc)
    )
    return ranked.filter(
        F.col("__rn") <= F.ceil(F.lit(q) * F.col("__cnt")).cast("bigint")
    ).select(
        id_col,
        domain_col,
        F.round(F.col("__q") * 1000000).cast("bigint").alias("score_micro"),
    )


@query(
    "corpus_domain_quality_filter",
    oracle=r"""
WITH s AS (
  SELECT doc_id, source,
         (LEAST(CAST(n_tok AS DOUBLE) / 64.0, 1.0) * 0.4
          + (1.0 - LEAST(CAST(n_punct AS DOUBLE)
                         / GREATEST(CAST(n_chars AS DOUBLE), 1.0) * 10.0,
                         1.0)) * 0.3
          + (CASE WHEN CAST(n_chars AS DOUBLE)
                       / GREATEST(CAST(n_tok AS DOUBLE), 1.0) >= 2.0
                   AND CAST(n_chars AS DOUBLE)
                       / GREATEST(CAST(n_tok AS DOUBLE), 1.0) <= 12.0
              THEN 1.0 ELSE 0.5 END) * 0.3) AS q
  FROM (
    SELECT doc_id, source,
           CASE WHEN LEN(TRIM(text)) = 0 THEN 0
                ELSE LEN(string_split_regex(TRIM(text), '\s+')) END AS n_tok,
           LEN(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS n_punct,
           LEN(text) AS n_chars
    FROM documents
  )
), r AS (
  SELECT doc_id, source, q,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY q DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM s
)
SELECT doc_id, source, CAST(ROUND(q * 1000000) AS BIGINT) AS score_micro
FROM r WHERE rn <= CAST(CEIL(0.3 * cnt) AS BIGINT)
""",
)
def corpus_domain_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30%-per-source quality filter, membership AND score
    hash-checked: the oracle replays quality_score's exact double chain
    (integer inputs n_tok/n_punct/n_chars, textually matched arithmetic)
    and the (score desc, doc_id) ordering with the ceil threshold."""
    d = t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return domain_quality_topq(d, q=0.3)
