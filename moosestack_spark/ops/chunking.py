"""Document chunking and sequence packing for LLM training pipelines.

- chunk_documents: overlapping fixed-size token windows per document
  (context-window preparation).  Pure JVM exprs: normalize whitespace,
  split once, then sequence/slice — no Python in the hot path, no shuffle
  at all (chunking is row-local; the explode multiplies rows, not
  exchanges).

- pack_documents: concat-and-split packing — documents are laid head to
  tail in a deterministic order (doc_id) and cut into fixed token-length
  sequences; each document is assigned (bin, offset).  The naive plan is
  a GLOBAL window cumsum (one partition sorts everything — the classic
  100 TB bottleneck).  Implemented instead as a two-phase prefix sum:
  range-partition by doc_id, per-partition cumsum via a partition-local
  window, then add broadcast per-partition offsets (the bounded
  #partitions-row collect).  Range boundaries come from sampling and are
  run-dependent, but the OUTPUT is boundary-independent: any ordered
  contiguous split yields the same global prefix sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, chunk, n_tok): whitespace-token windows of
    `chunk_size` every `stride` tokens (overlap = chunk_size - stride)."""
    words = F.split(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " "
    )
    n = F.size(words)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: s < n,
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.array_join(F.slice(words, s + 1, chunk_size), " ").alias("chunk"),
            F.least(F.lit(chunk_size), n - s).cast("bigint").alias("n_tok"),
        ),
    )
    return df.select(id_col, F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_idx", "c.chunk", "c.n_tok"
    )


def pack_documents(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    ntok_col: str = "n_tok",
) -> DataFrame:
    """Concat-and-split packing: documents concatenated in id order and cut
    every `seq_len` tokens.  Returns (id, n_tok, bin_id, bin_offset) where
    bin_offset is the document's start position within its first bin.
    Two-phase prefix sum — no global single-partition sort."""
    spark = df.sparkSession
    n_parts = max(2, spark.sparkContext.defaultParallelism // 2)
    parted = df.select(id_col, ntok_col).repartitionByRange(n_parts, F.col(id_col))
    pid = parted.withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pid.withColumn("__cum_incl", F.sum(ntok_col).over(w))
    # bounded collect: one row per partition -> running offsets
    part_totals = {
        r["__pid"]: r["__t"]
        for r in local.groupBy("__pid").agg(F.max("__cum_incl").alias("__t")).collect()
    }
    offsets, acc = {}, 0
    for p in sorted(part_totals):
        offsets[p] = acc
        acc += part_totals[p]
    off = F.create_map(
        *[x for p, o in offsets.items() for x in (F.lit(int(p)), F.lit(int(o)))]
    )[F.col("__pid")]
    cum_before = (off + F.col("__cum_incl") - F.col(ntok_col)).cast("bigint")
    return local.select(
        id_col,
        F.col(ntok_col).cast("bigint").alias(ntok_col),
        F.floor(cum_before / seq_len).cast("bigint").alias("bin_id"),
        (cum_before % seq_len).cast("bigint").alias("bin_offset"),
    )


@query(
    "text_chunk_overlap",
    oracle=r"""
WITH w AS (
  SELECT doc_id,
         string_split(regexp_replace(TRIM(text), '\s+', ' ', 'g'), ' ') AS words
  FROM documents
), s AS (
  SELECT doc_id, words, len(words) AS n FROM w
), starts AS (
  SELECT doc_id, words, n, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT), 48)) AS i
  FROM s
)
SELECT doc_id,
       CAST(i // 48 AS INTEGER) AS chunk_idx,
       array_to_string(words[CAST(i + 1 AS BIGINT):CAST(i + 64 AS BIGINT)], ' ') AS chunk,
       CAST(LEAST(64, n - i) AS BIGINT) AS n_tok
FROM starts
""",
)
def text_chunk_overlap(spark, sf_dir: str) -> DataFrame:
    """64-token chunks with 16-token overlap over the documents corpus;
    chunk text and counts hash-compared (same whitespace normalization in
    both engines)."""
    return chunk_documents(t(spark, sf_dir, "documents"))


@query(
    "text_pack_sequences",
    oracle=r"""
WITH tok AS (
  SELECT doc_id,
         len(string_split(regexp_replace(TRIM(text), '\s+', ' ', 'g'), ' ')) AS n_tok
  FROM documents
), c AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         CAST(SUM(n_tok) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS BIGINT)
           AS cum_before
  FROM tok
)
SELECT doc_id, n_tok,
       CAST(cum_before // 2048 AS BIGINT) AS bin_id,
       CAST(cum_before % 2048 AS BIGINT) AS bin_offset
FROM c
""",
)
def text_pack_sequences(spark, sf_dir: str) -> DataFrame:
    """Pack the corpus into 2048-token training sequences via the
    distributed prefix sum; the oracle computes the same assignment with a
    plain window cumsum — identical results, different (scalable) plan."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.size(
            F.split(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "), " ")
        ).alias("n_tok"),
    )
    return pack_documents(toks, seq_len=2048)
