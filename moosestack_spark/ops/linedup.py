"""Cross-document line/paragraph deduplication (C4-style).

Beyond-reference operator family (no moosestack counterpart) — SURVEY.md §8.
C4 (Raffel et al. 2020, §2.2) removes any three-sentence span that occurs
more than once in the corpus; Gopher/MassiveText and RefinedWeb apply the
same rule at line granularity.  The driver's synthetic documents carry no
sentence boundaries, so the unit here is a fixed-width word window (a
"line" of LINE_WORDS consecutive words) — the algorithm is identical for
real newline-split lines: segment, fingerprint, count across documents,
drop segments whose fingerprint occurs in more than one document.

Scale design (100 TB):
- segmentation is a narrow projection (split + slice, whole-stage codegen;
  no Python);
- the only wide operation is one groupBy on the segment fingerprint with a
  map-side partial count — at scale group on xxhash64(segment), never the
  raw text (the gate query groups on the text itself only so the DuckDB
  oracle can mirror it);
- the duplicated-segment set is a tiny fraction of all segments, so the
  doc-side re-join streams against a shuffle (or broadcast, when the dup
  set fits) rather than materializing per-doc segment lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

LINE_WORDS = 3


def segment_lines(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Explode each document into its consecutive non-overlapping n-word
    segments, keeping (id, line_id, line).  Documents shorter than n words
    produce no segments (C4 skips short lines the same way)."""
    words = F.split(F.col(text_col), " ")
    n_segs = F.floor(F.size(words) / n).cast("int")
    return (
        df.filter(F.size(words) >= n)
        .select(
            F.col(id_col),
            F.posexplode(F.expr(f"sequence(0, CAST(size(split({text_col}, ' ')) / {n} AS INT) - 1)")).alias(
                "line_id", "_i"
            ),
            words.alias("__w"),
        )
        .select(
            id_col,
            "line_id",
            F.concat_ws(" ", F.slice(F.col("__w"), F.col("line_id") * n + 1, n)).alias("line"),
        )
    )


@query(
    "dedup_cross_doc_lines",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
segs AS (
  SELECT doc_id, i AS line_id,
         array_to_string(w[i*{LINE_WORDS}+1 : i*{LINE_WORDS}+{LINE_WORDS}], ' ') AS line
  FROM docs,
       UNNEST(generate_series(0, (len(w) // {LINE_WORDS}) - 1)) AS g(i)
  WHERE len(w) >= {LINE_WORDS}
),
dup_lines AS (
  SELECT line FROM segs GROUP BY line HAVING COUNT(DISTINCT doc_id) > 1
),
per_doc AS (
  SELECT s.doc_id,
         COUNT(*) AS n_lines,
         COUNT(d.line) AS dup_lines
  FROM segs s LEFT JOIN dup_lines d ON s.line = d.line
  GROUP BY s.doc_id
)
SELECT doc_id, n_lines, dup_lines FROM per_doc WHERE dup_lines > 0
""",
)
def dedup_cross_doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document count of corpus-duplicated line segments: a line is
    duplicated when the same {LINE_WORDS}-word segment appears in MORE THAN
    ONE document.  Output = docs containing at least one duplicated line,
    with total and duplicated segment counts — the bookkeeping a C4-style
    cleaner emits before rewriting the text.

    Plan: segment (narrow) -> groupBy(line) count-distinct-doc (single
    shuffle, partial agg) -> semi-ish join back (second shuffle on line,
    broadcastable when the dup set is small) -> groupBy(doc) (third shuffle,
    bounded by docs).  At 100 TB the line key is xxhash64(line), shrinking
    shuffle width ~20x vs raw text."""
    d = t(spark, sf_dir, "documents")
    segs = segment_lines(d, "doc_id", "text", LINE_WORDS)
    dup_lines = (
        segs.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") > 1)
        .select("line")
    )
    per_doc = (
        segs.join(dup_lines.withColumn("__dup", F.lit(1)), "line", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count("__dup").alias("dup_lines"),
        )
        .filter(F.col("dup_lines") > 0)
    )
    return per_doc.select("doc_id", "n_lines", "dup_lines")


@query(
    "dedup_cross_doc_lines_clean",
    oracle=f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
segs AS (
  SELECT doc_id, i AS line_id,
         array_to_string(w[i*{LINE_WORDS}+1 : i*{LINE_WORDS}+{LINE_WORDS}], ' ') AS line
  FROM docs,
       UNNEST(generate_series(0, (len(w) // {LINE_WORDS}) - 1)) AS g(i)
  WHERE len(w) >= {LINE_WORDS}
),
keep AS (
  SELECT line, MIN(doc_id) AS keeper
  FROM segs GROUP BY line
),
lost AS (
  SELECT DISTINCT s.doc_id
  FROM segs s JOIN keep k ON s.line = k.line
  WHERE s.doc_id <> k.keeper
)
SELECT s.doc_id,
       array_to_string(list(s.line ORDER BY s.line_id), ' ') AS clean_text
FROM segs s
WHERE s.doc_id NOT IN (SELECT doc_id FROM lost)
GROUP BY s.doc_id
ORDER BY s.doc_id
LIMIT 50
""",
)
def dedup_cross_doc_lines_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rewrite pass: each line survives only in its lowest-doc_id owner
    (greedy keeper, deterministic across engines and layouts).  Output =
    the 50 lowest doc_ids that OWN every one of their lines (no rewriting
    needed), with their text reconstructed from the surviving segments —
    the exact-membership check that pins the keeper assignment.

    Greedy keeper-by-min-doc_id is deterministic across engines and
    layouts; the reconstruction groupBy carries (line_id, line) so order
    is restored without any window function."""
    d = t(spark, sf_dir, "documents")
    segs = segment_lines(d, "doc_id", "text", LINE_WORDS)
    keep = segs.groupBy("line").agg(F.min("doc_id").alias("keeper"))
    joined = segs.join(keep, "line")
    # docs in which EVERY line is owned by this doc
    all_kept = (
        joined.groupBy("doc_id")
        .agg(F.sum(F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)).alias("__lost"))
        .filter(F.col("__lost") == 0)
        .select("doc_id")
    )
    clean = (
        joined.join(all_kept, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("clean_text")
        )
        .orderBy("doc_id")
        .limit(50)
    )
    return clean
