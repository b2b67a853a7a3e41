"""Materialized-view gate queries (SURVEY.md §4.2, FIXTURES.md "MV
incremental"): a daily events rollup maintained incrementally over 3 insert
batches must equal the recompute-from-scratch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.catalog.materialized_view import AggSpec, IncrementalAggregateView
from moosestack_spark.registry import query
from moosestack_spark.tables import t


def _daily_rollup_view() -> IncrementalAggregateView:
    # Mirrors the Bar/BarAggregated MV shape (templates/python-tests/src/
    # views/bar_aggregated.py:16-24): count, countIf, sum, max per bucket.
    return IncrementalAggregateView(
        group_keys=["day", "event_type"],
        aggs=[
            AggSpec("total_rows", "count"),
            AggSpec("high_value_rows", "count_if", cond=F.col("value") > 50),
            AggSpec("total_value", "sum", expr=F.col("value")),
            AggSpec("max_value", "max", expr=F.col("value")),
            AggSpec("avg_value", "avg", expr=F.col("value")),
        ],
    )


MV_ORACLE = """
SELECT
  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
  event_type,
  COUNT(*) AS total_rows,
  COUNT(*) FILTER (WHERE value > 50) AS high_value_rows,
  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value,
  MAX(value) AS max_value,
  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events
GROUP BY strftime(CAST(ts AS DATE), '%Y-%m-%d'), event_type
"""


@query("mv_incremental_daily_rollup", oracle=MV_ORACLE)
def mv_incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 insert batches folded incrementally == full recompute (the oracle).

    Batches are split deterministically by event_id % 3, simulating three
    separate ingest blocks hitting the MV (per-block computation, §4.2).
    """
    e = t(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "event_type", "value", "event_id"
    )
    view = _daily_rollup_view()
    for i in range(3):
        block = e.filter(F.col("event_id") % 3 == i).drop("event_id")
        view.refresh(block)
    return view.read()


@query("mv_populate_matches_incremental", oracle=MV_ORACLE)
def mv_populate_matches_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial backfill path (populate == INSERT INTO target SELECT,
    blocks.py:776-780) must produce the same view as the oracle too."""
    e = t(spark, sf_dir, "events").select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"), "event_type", "value"
    )
    return _daily_rollup_view().populate(e).read()


# --------------------------------------------------------------------------
# Hypertable-style multi-granularity rollup: a continuous-aggregate ladder
# where each coarser level is derived ONLY from the next finer level's
# partial states — never from raw rows (count/sum/min/max compose; avg =
# sum/count pair).  At 100 TB this is the difference between re-scanning a
# fact table per granularity and an O(|hour rows|) re-aggregation: the day
# level reads 24x fewer rows than raw, month reads ~30x fewer than day.
# The gate proves partial-state composition: day-from-hour must hash-match
# a day-from-raw oracle.
# --------------------------------------------------------------------------


@query(
    "mv_hypertable_rollup",
    oracle="""
SELECT
  strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
  event_type,
  COUNT(*) AS total_rows,
  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) AS total_value,
  MAX(value) AS max_value,
  CAST(SUM(CAST(value AS DECIMAL(25,4))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events
GROUP BY strftime(CAST(ts AS DATE), '%Y-%m-%d'), event_type
""",
)
def mv_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day level computed strictly from hour-level partials (sum of counts,
    sum of decimal sums, max of maxes; avg finalized as sum/count at the
    day level — a single IEEE divide over exact decimal inputs)."""
    e = t(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour_ts"),
        "event_type",
        F.col("value").cast("decimal(25,4)").alias("v_dec"),
        "value",
    )
    hour = e.groupBy("hour_ts", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_dec").alias("s_dec"),
        F.max("value").alias("mx"),
    )
    day = (
        hour.groupBy(
            F.date_format(F.to_date("hour_ts"), "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.sum("n").alias("total_rows"),
            F.sum("s_dec").alias("s_dec_day"),
            F.max("mx").alias("max_value"),
        )
        .select(
            "day",
            "event_type",
            "total_rows",
            F.col("s_dec_day").cast("double").alias("total_value"),
            "max_value",
            (F.col("s_dec_day").cast("double") / F.col("total_rows")).alias(
                "avg_value"
            ),
        )
    )
    return day


@query(
    "mv_incremental_join",
    oracle="""
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
       c.c_name, c.c_mktsegment
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def mv_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-MV delta maintenance: orders arrive in 3 batches and customer
    in 2, interleaved; every refresh applies d(A ⋈ B) = dA⋈B ∪ A⋈dB ∪
    dA⋈dB (catalog/materialized_view.py IncrementalJoinView).  The final
    materialized join must equal the one-shot join oracle REGARDLESS of
    the interleaving — each (order, customer) pair lands in exactly one
    delta term."""
    from moosestack_spark.catalog.materialized_view import IncrementalJoinView

    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    ).withColumnRenamed("o_custkey", "custkey")
    c = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    view = IncrementalJoinView(on=["custkey"])
    # interleaved insert schedule: o0 | c0 | o1+c1 | o2
    view.refresh(da=o.filter(F.col("o_orderkey") % 3 == 0))
    view.refresh(db=c.filter(F.col("custkey") % 2 == 0))
    view.refresh(
        da=o.filter(F.col("o_orderkey") % 3 == 1),
        db=c.filter(F.col("custkey") % 2 == 1),
    )
    view.refresh(da=o.filter(F.col("o_orderkey") % 3 == 2))
    return view.read().select(
        "o_orderkey",
        F.col("custkey").alias("o_custkey"),
        "cents",
        "c_name",
        "c_mktsegment",
    )
