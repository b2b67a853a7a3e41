"""Table profiling: per-column data-quality statistics in ONE pass.

Beyond-reference operator (SURVEY.md §8): the reference surfaces table
metadata through its metrics console and `moose peek`
(apps/framework-cli/src/cli/commands.rs:104-118) but has no column
profiler; every serious lake/warehouse tool ships one, and a
training-data pipeline needs it as the first look at any new corpus
(null rates before imputation, distinct counts before choosing join
keys or dictionary encodings, length stats before tokenizer budgeting).

Scale design (100 TB): ALL columns profile in ONE aggregation over ONE
scan — a single row of (count, nulls, distinct, min, max, length-sum)
tuples per column, unpivoted driver-side cheaply with ``stack``.  The
only shuffle is the final single-row combine; count_distinct is exact
here (gate semantics) with approx_count_distinct the documented swap-in
at trillion-row scale.  min/max are serialized to strings so the profile
row-shape is column-type-independent (and driver-canonicalizable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass per-column profile: (column, n_rows, n_nulls, n_distinct,
    min_str, max_str, total_len).  ``total_len`` is the summed string
    length (cast for non-strings) — length-budget signal for text columns,
    harmless elsewhere."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("bigint")).alias(f"__nulls_{c}"),
            F.count_distinct(col).alias(f"__dist_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
            F.sum(F.coalesce(F.length(col.cast("string")), F.lit(0)).cast("bigint"))
            .alias(f"__len_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}, __len_{c}"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_str, max_str, total_len)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str",
        "total_len",
    )


def _profile_oracle(table: str, cols: list[str]) -> str:
    parts = [
        f"""SELECT '{c}' AS "column",
       (SELECT COUNT(*) FROM {table}) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str,
       CAST(SUM(COALESCE(length(CAST({c} AS VARCHAR)), 0)) AS BIGINT) AS total_len
FROM {table}"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


@query(
    "profile_table_stats",
    oracle=_profile_oracle(
        "documents", ["doc_id", "text", "lang", "source", "n_chars"]
    ),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every column of the documents table in one scan: null
    count, exact distinct count, min/max (string-serialized), total
    string length.  The oracle recomputes each column's stats
    independently — five scans there vs ONE here."""
    d = t(spark, sf_dir, "documents")
    return profile_columns(d, ["doc_id", "text", "lang", "source", "n_chars"])


# --------------------------------------------------------------------------
# Population Stability Index drift between the first and second half of the
# event stream (rank split on the dense event_id, so the split is
# SF-stable) over fixed-width value buckets.  The ML-ops drift metric a
# training pipeline runs between snapshots before trusting a feature.
# Counts are exact integers; each bucket's PSI term is ONE fixed FP tree
# ((p2-p1)*ln(p2/p1) with add-1 smoothing so empty buckets stay finite),
# surfaced as float32 per the house log-output rule — no cross-bucket FP
# sum (the per-bucket matrix is the deliverable; summing 10 floats is the
# caller's one-liner).  Scale: one scan, one groupBy on the bucket id.
# --------------------------------------------------------------------------


@query(
    "profile_psi_drift",
    oracle="""
WITH half AS (
  SELECT (MAX(event_id) + 1) // 2 AS h FROM events
), bucketed AS (
  SELECT LEAST(CAST(FLOOR(value / 5) AS INT), 9) AS bucket,
         CASE WHEN event_id < (SELECT h FROM half) THEN 1 ELSE 0 END AS in1
  FROM events
), cnts AS (
  SELECT bucket,
         CAST(SUM(in1) AS BIGINT) AS cnt1,
         CAST(SUM(1 - in1) AS BIGINT) AS cnt2
  FROM bucketed GROUP BY bucket
), tot AS (
  SELECT SUM(cnt1) AS t1, SUM(cnt2) AS t2, COUNT(*) AS nb FROM cnts
)
SELECT bucket, cnt1, cnt2,
       CAST(
         (CAST(cnt2 + 1 AS DOUBLE) / (t2 + nb)
          - CAST(cnt1 + 1 AS DOUBLE) / (t1 + nb))
         * ln((CAST(cnt2 + 1 AS DOUBLE) / (t2 + nb))
              / (CAST(cnt1 + 1 AS DOUBLE) / (t1 + nb)))
       AS FLOAT) AS psi_term
FROM cnts, tot
""",
)
def profile_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket PSI terms between event-stream halves (rank split on
    event_id, 10 fixed-width value buckets, add-1 smoothing)."""
    e = t(spark, sf_dir, "events")
    half = e.agg(F.expr("(MAX(event_id) + 1) div 2").alias("h"))
    bucketed = e.crossJoin(F.broadcast(half)).select(
        F.expr("LEAST(CAST(FLOOR(value / 5) AS INT), 9)").alias("bucket"),
        F.when(F.col("event_id") < F.col("h"), 1).otherwise(0).alias("in1"),
    )
    cnts = bucketed.groupBy("bucket").agg(
        F.sum("in1").cast("bigint").alias("cnt1"),
        F.sum(F.lit(1) - F.col("in1")).cast("bigint").alias("cnt2"),
    )
    tot = cnts.agg(
        F.sum("cnt1").alias("t1"),
        F.sum("cnt2").alias("t2"),
        F.count(F.lit(1)).alias("nb"),
    )
    p1 = (F.col("cnt1") + 1).cast("double") / (F.col("t1") + F.col("nb"))
    p2 = (F.col("cnt2") + 1).cast("double") / (F.col("t2") + F.col("nb"))
    return cnts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "cnt1",
        "cnt2",
        ((p2 - p1) * F.log(p2 / p1)).cast("float").alias("psi_term"),
    )
