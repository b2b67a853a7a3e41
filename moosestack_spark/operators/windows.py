"""Window functions (SURVEY.md §2.5).

The reference exposes windows as ClickHouse SQL passthrough; the three shapes
seen in its templates define the required surface:

- ranking:  row_number() OVER (ORDER BY x DESC)
  (templates/live-heartrate-leaderboard/app/apis/get_leaderboard.py:88)
- analytic: lagInFrame(x, 1, default) OVER (PARTITION BY u ORDER BY ts)
  (.../get_user_live_heart_rate_stats.py:70)
- framed agg: sum(x) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
  (.../get_user_live_heart_rate_stats.py:84)

Scale note: a global ORDER BY window (no PARTITION BY) funnels all rows into
one task; at 100 TB that shape is only valid after a selective filter or
pre-aggregation, which is how these gate queries use it (ranking over a
pre-aggregated / filtered set).  Per-key windows partition by the key and
scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import dsum, sql_dsum
from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# Ranking: top-10 customers by total spend.  Aggregate first (shuffle on
# custkey), then the global window runs over only |customers| rows.
# row_number ties are broken deterministically by custkey.
# --------------------------------------------------------------------------


@query(
    "window_row_number_topk",
    oracle=f"""
SELECT * FROM (
  SELECT
    o_custkey,
    spend,
    ROW_NUMBER() OVER (ORDER BY spend DESC, o_custkey) AS rnk
  FROM (
    SELECT o_custkey, {sql_dsum('o_totalprice')} AS spend
    FROM orders GROUP BY o_custkey
  )
) WHERE rnk <= 10
""",
)
def window_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("spend"))
    w = Window.orderBy(F.desc("spend"), F.asc("o_custkey"))
    return spend.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 10)


# --------------------------------------------------------------------------
# rank / dense_rank with deterministic tie handling on integer-valued data.
# --------------------------------------------------------------------------


@query(
    "window_rank_dense",
    oracle="""
SELECT
  p_brand,
  p_size,
  RANK()       OVER (PARTITION BY p_brand ORDER BY p_size) AS size_rank,
  DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size) AS size_dense_rank
FROM part
WHERE p_size <= 10
""",
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    w = Window.partitionBy("p_brand").orderBy("p_size")
    return p.select(
        "p_brand",
        "p_size",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
    )


# --------------------------------------------------------------------------
# Analytic lag with default — the lagInFrame(hr_value, 1, 0) shape, keyed per
# user over the events stream (ts is unique per user in the test data via
# event_id tiebreak).
# --------------------------------------------------------------------------


@query(
    "window_lag",
    oracle="""
SELECT
  event_id,
  user_id,
  value,
  LAG(value, 1, CAST(0.0 AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
FROM events
""",
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1, 0.0).over(w).alias("prev_value"),
    )


# --------------------------------------------------------------------------
# Framed running aggregate: per-user running event count and running exact
# sum (decimal internally for cross-engine determinism, surfaced as double).
# --------------------------------------------------------------------------


@query(
    "window_running_sum",
    oracle="""
SELECT
  event_id,
  user_id,
  CAST(SUM(CAST(value AS DECIMAL(25,4))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS DOUBLE) AS running_value,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS running_n
FROM events
""",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


# --------------------------------------------------------------------------
# first_value / last_value over a frame (CH `any`/`anyLast` analytic shape).
# --------------------------------------------------------------------------


@query(
    "window_first_last",
    oracle="""
SELECT DISTINCT
  user_id,
  FIRST_VALUE(event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS first_event,
  LAST_VALUE(event_type) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS last_event
FROM events
""",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_event"),
        F.last("event_type").over(w).alias("last_event"),
    ).distinct()


# --------------------------------------------------------------------------
# Full analytic/distribution window family (§2.5: lag/lead/first/last
# already covered; ntile/percent_rank/cume_dist round out the vocabulary a
# CH SQL passthrough user would send).
# --------------------------------------------------------------------------


@query(
    "window_lead_distribution",
    oracle="""
SELECT o_orderkey, o_custkey,
       LEAD(o_totalprice, 1) OVER w AS next_price,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 8) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
""",
)
def window_lead_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead + ntile + percent_rank + cume_dist in one per-customer pass —
    a single window shuffle serves all four (ROUND(…,8) pins the ratio
    columns: both engines compute (rank-1)/(n-1) with identical integer
    inputs, the round only guards display formatting)."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
    )


@query(
    "window_range_frame",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,4))) OVER (
         PARTITION BY l_returnflag ORDER BY l_quantity
         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS running_price
FROM lineitem
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (peer rows included — rows with equal ordering value get
    the same running total, unlike ROWS).  Exact decimal accumulation keeps
    the running sums engine-identical regardless of within-peer order."""
    li = t(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast("decimal(25,4)"))
        .over(w)
        .cast("double")
        .alias("running_price"),
    )


# --------------------------------------------------------------------------
# Moving average (bounded ROWS frame): the time-series smoothing shape.
# --------------------------------------------------------------------------


@query(
    "window_moving_avg",
    oracle="""
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS DECIMAL(25,4))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS moving_avg
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY ts, event_id
  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-point trailing moving average of event values per user.  The ROWS
    frame keeps per-row state bounded (4 values) whatever the partition
    size; exact decimal sum / window count -> one IEEE division, so short
    leading windows (1-3 rows) are exact too."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    avg = F.sum(F.col("value").cast("decimal(25,4)")).over(w).cast(
        "double"
    ) / F.count(F.lit(1)).over(w)
    return ev.select("user_id", "event_id", avg.alias("moving_avg"))


# --------------------------------------------------------------------------
# Batch sessionization (gap islands): assign session ids + per-session
# stats in one pass — the batch counterpart of streaming_session_window.
# --------------------------------------------------------------------------


@query(
    "sessionize_batch",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
              PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
           OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS is_start
  FROM events
), numbered AS (
  SELECT user_id, ts, event_id,
    SUM(is_start) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM marked
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
  COUNT(*) AS n_events,
  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  CAST(MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS BIGINT) AS duration_us
FROM numbered GROUP BY user_id, session_no
""",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a session breaks after 30 idle
    minutes; sessions are numbered per user in time order and aggregated to
    (count, start, duration).  Classic two-window islands plan — both
    windows and the final groupBy share the user_id exchange, so the whole
    operator is ONE shuffle at any scale."""
    ev = t(spark, sf_dir, "events")
    order = ["ts", "event_id"]
    w = Window.partitionBy("user_id").orderBy(*order)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    # exact microsecond gap comparison: second-truncating casts shift
    # gaps whose fractional parts straddle a second boundary
    is_start = (prev_us.isNull() | (us - prev_us > 30 * 60 * 1_000_000)).cast(
        "int"
    )
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("__start", is_start)
        .withColumn("session_no", F.sum("__start").over(run).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            (F.max(F.unix_micros("ts")) - F.min(F.unix_micros("ts")))
            .cast("bigint")
            .alias("duration_us"),
        )
    )


# --------------------------------------------------------------------------
# IGNORE NULLS navigation: last known value per row (the gap-carry shape).
# --------------------------------------------------------------------------


@query(
    "window_last_value_ignore_nulls",
    oracle="""
WITH v AS (
  SELECT user_id, event_id, ts,
    CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
  FROM events
)
SELECT user_id, event_id,
  LAST_VALUE(purchase_value IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
FROM v
""",
)
def window_last_value_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Carry the most recent purchase value forward over non-purchase rows
    (LAST_VALUE ... IGNORE NULLS — the standard gap-fill/forward-fill
    navigation).  Same single user_id exchange as every per-user window."""
    ev = t(spark, sf_dir, "events")
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@query(
    "window_nth_value",
    oracle="""
SELECT o_orderkey, o_custkey,
       NTH_VALUE(o_totalprice, 2) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS second_price
FROM orders
""",
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTH_VALUE with an explicit running frame (NULL until the partition
    has seen n rows) — the frame is spelled out because the ANSI default
    (RANGE ... CURRENT ROW) and engine defaults differ in peer handling;
    pinning ROWS makes both engines see identical frames."""
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "window_running_difference",
    oracle="""
SELECT user_id, event_id,
       CAST(CAST(round(value * 100) AS BIGINT)
            - COALESCE(lag(CAST(round(value * 100) AS BIGINT)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id), 
                CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS diff_cents,
       CAST(COALESCE(CAST(round(value * 100) AS BIGINT)
            - lag(CAST(round(value * 100) AS BIGINT), 3) OVER (
                PARTITION BY user_id ORDER BY ts, event_id), 0) AS BIGINT)
         AS neighbor3_delta
FROM events WHERE event_id % 13 = 0
""",
)
def window_running_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH runningDifference (first row yields 0 — lag defaulting to the
    value itself) and neighbor(x, -3) delta per user in event order, on
    exact integer cents.  One window exchange shared by both lags."""
    ev = t(spark, sf_dir, "events").filter("event_id % 13 = 0")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        (cents - F.coalesce(F.lag(cents).over(w), cents))
        .cast("bigint")
        .alias("diff_cents"),
        F.coalesce(cents - F.lag(cents, 3).over(w), F.lit(0))
        .cast("bigint")
        .alias("neighbor3_delta"),
    )


@query(
    "window_nonnegative_derivative",
    oracle="""
SELECT user_id, event_id,
       CASE WHEN lag_c IS NULL OR dt_ms <= 0 THEN NULL
            ELSE GREATEST(0.0, CAST(c - lag_c AS DOUBLE) / dt_ms) END
         AS rate_per_ms
FROM (
  SELECT user_id, event_id,
         CAST(round(value * 100) AS BIGINT) AS c,
         lag(CAST(round(value * 100) AS BIGINT)) OVER w AS lag_c,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS dt_ms
  FROM events WHERE event_id % 11 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
""",
)
def window_nonnegative_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH nonNegativeDerivative re-expressed as window algebra: per user
    in (ts, event_id) order, the clamped-at-zero rate of change of the
    exact integer cents per MILLISECOND of elapsed time.  Pinned
    definition (documented): the first row and rows with non-positive
    elapsed time emit NULL; dt is exact epoch-millis arithmetic, so the
    only float is the final division of two exact bigints."""
    ev = t(spark, sf_dir, "events").filter("event_id % 11 = 0")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_c = F.lag(cents).over(w)
    dt_ms = F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.when(
            lag_c.isNull() | (dt_ms <= 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.greatest(
                F.lit(0.0), (cents - lag_c).cast("double") / dt_ms
            )
        )
        .alias("rate_per_ms"),
    )
