"""Aggregates, part 2: CH time-series/bit aggregates, pivot, exact corr,
gap filling, and LIMIT BY (SURVEY.md §2.4/§2.6/§2.9 widening).

ClickHouse surface covered here (aggregate-functions/reference +
select/limit-by): ``deltaSum`` (sum of positive deltas in order),
``groupBitAnd/Or/Xor``, fixed-bin ``histogram``, ``corr``, ``WITH FILL``
(gap filling), ``LIMIT n BY group``.  Plus Spark-native pivot — moose users
express it today as conditional aggregates through raw SQL; the operator
form compiles to the same single-shuffle plan.

Float discipline (operators/_determinism.py): every sum that feeds a float
result is an exact decimal sum; the float appears only in a final fixed
expression tree evaluated identically by Spark and DuckDB (single IEEE ops
on identical inputs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import dec, sql_dec
from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# deltaSum: sum of positive increments in event order (CH deltaSum; the
# counter-reset-tolerant rate primitive for monitoring rollups).
# --------------------------------------------------------------------------


@query(
    "agg_delta_sum",
    oracle=f"""
WITH d AS (
  SELECT user_id,
    {sql_dec('value')} - lag({sql_dec('value')}) OVER (
      PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events
)
SELECT user_id,
  CAST(COALESCE(SUM(CASE WHEN delta > 0 THEN delta END),
                CAST(0 AS DECIMAL(25,4))) AS DOUBLE) AS delta_sum
FROM d GROUP BY user_id
""",
)
def agg_delta_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deltaSum(value) per user over (ts, event_id) order: positive deltas
    accumulate, drops/resets are ignored.  One shuffle (partitionBy user)
    shared by the lag window and the final aggregate — Catalyst reuses the
    exchange because the window and groupBy keys match."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = dec("value") - F.lag(dec("value")).over(w)
    zero = F.lit(0).cast("decimal(25,4)")
    return (
        ev.withColumn("__delta", delta)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__delta") > 0, F.col("__delta"))), zero
            )
            .cast("double")
            .alias("delta_sum")
        )
    )


# --------------------------------------------------------------------------
# groupBitAnd / groupBitOr / groupBitXor.
# --------------------------------------------------------------------------


@query(
    "agg_bit_ops",
    oracle="""
SELECT event_type,
  BIT_AND(event_id) AS bits_and,
  BIT_OR(event_id) AS bits_or,
  BIT_XOR(event_id) AS bits_xor
FROM events GROUP BY event_type
""",
)
def agg_bit_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBitAnd/Or/Xor over event ids per type — integer-exact,
    order-independent, single map-side-combined shuffle."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").alias("bits_and"),
        F.bit_or("event_id").alias("bits_or"),
        F.bit_xor("event_id").alias("bits_xor"),
    )


# --------------------------------------------------------------------------
# Pivot: per-user event counts fanned into one column per event type.
# --------------------------------------------------------------------------

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot_event_counts",
    oracle="""
SELECT user_id,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
""",
)
def agg_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy(user).pivot(event_type) with an EXPLICIT category list — the
    two-pass 'discover values then pivot' form is a hidden extra job and
    non-deterministic column order at 100 TB; pinning the list compiles to
    one conditional-aggregate shuffle, identical to the FILTER oracle."""
    ev = t(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).count()
    # pivot leaves null where a (user, type) combo never occurred; the
    # conditional-count oracle yields 0 — align.
    return out.fillna(0, subset=EVENT_TYPES)


# --------------------------------------------------------------------------
# corr (exact-input Pearson correlation).
# --------------------------------------------------------------------------


@query(
    "agg_corr_exact",
    oracle="""
WITH z AS (
  SELECT l_returnflag,
    CAST(l_quantity AS BIGINT) AS x,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx,
    CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(SUM(x * x) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy,
    CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM z GROUP BY l_returnflag
)
SELECT l_returnflag,
  (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
    AS corr_qty_price
FROM s
""",
)
def agg_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson corr(quantity, extendedprice) per return flag.  Moments are
    computed on INTEGER-scaled inputs (quantity is integral by the data
    contract; price in exact cents) — correlation is invariant under
    positive linear scaling, the integer sums are order-independent and
    exact, and each surfaces as a double through a SINGLE integer->double
    rounding (wide-DECIMAL sums double-round through the scale division in
    DuckDB — measured 4-ulp drift — so integers, not decimals, are the
    cross-engine moment representation).  The correlation itself is one
    fixed IEEE expression tree on identical doubles — unlike the engines'
    builtin corr(), whose internal accumulation orders differ."""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    z = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    xx, yy = F.col("x"), F.col("y")
    wide = "decimal(38,0)"  # y*y sums exceed int64 at bench SF and beyond
    s = z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xx).cast("double").alias("sx"),
        F.sum(yy).cast("double").alias("sy"),
        F.sum(xx * xx).cast("double").alias("sxx"),
        F.sum((yy * yy).cast(wide)).cast("double").alias("syy"),
        F.sum((xx * yy).cast(wide)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return s.select("l_returnflag", corr.alias("corr_qty_price"))


# --------------------------------------------------------------------------
# Gap filling (CH ORDER BY ... WITH FILL): dense hourly series per group.
# --------------------------------------------------------------------------


@query(
    "ts_gap_fill_hourly",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), hours AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(hours.h, '%Y-%m-%d %H:%M:%S') AS hour,
       types.event_type,
       COALESCE(actual.n, 0) AS n
FROM hours CROSS JOIN types
LEFT JOIN actual ON actual.h = hours.h AND actual.event_type = types.event_type
""",
)
def ts_gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly counts per event type: every (hour, type) cell exists,
    zero-filled where no events landed (WITH FILL).  The hour spine is one
    sequence() from the global min/max (a 2-row aggregate broadcast), so
    the dense grid costs |hours| x |types| rows — never a shuffle of the
    fact table beyond the count itself."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        hours.crossJoin(F.broadcast(types))
        .join(F.broadcast(actual), ["h", "event_type"], "left")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# LIMIT n BY group (CH select/limit-by).
# --------------------------------------------------------------------------


@query(
    "sort_limit_by_group",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
    row_number() OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn <= 3
""",
)
def sort_limit_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT 3 BY c_mktsegment``: the top 3 orders by price within
    every segment.  Compiled as a rank-filter window — with bounded n the
    per-partition window carries a running top-3, never a full sort spill."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------------
# Fixed-bin histogram (deterministic variant of CH histogram(N)).
# --------------------------------------------------------------------------

BIN_WIDTH = 10000


@query(
    "agg_histogram_fixed",
    oracle=f"""
SELECT CAST(FLOOR(o_totalprice / {BIN_WIDTH}) AS BIGINT) AS bin,
  COUNT(*) AS n,
  CAST(CAST(FLOOR(o_totalprice / {BIN_WIDTH}) AS BIGINT) * {BIN_WIDTH} AS DOUBLE) AS bin_lo
FROM orders GROUP BY 1
""",
)
def agg_histogram_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-price histogram with fixed-width bins.  CH's histogram(N) uses
    adaptive (data-dependent, approximate) bin edges; fixed-width bins are
    the deterministic variant that merges trivially across partitions —
    one map-side-combined shuffle at any SF.  floor(price/width) on a
    2-decimal fixed-point double never sits on a boundary ulp, so the bin
    assignment is cross-engine exact."""
    o = t(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / BIN_WIDTH).cast("bigint")
    return o.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
    ).select(
        "bin", "n", (F.col("bin") * BIN_WIDTH).cast("double").alias("bin_lo")
    )


# --------------------------------------------------------------------------
# WITH TOTALS (CH select/group-by modifier): the grouped rows plus one
# all-group totals row.
# --------------------------------------------------------------------------


@query(
    "agg_with_totals",
    oracle=f"""
SELECT COALESCE(l_returnflag, '<totals>') AS returnflag,
  COUNT(*) AS n,
  {sql_dec('l_quantity').join(['CAST(SUM(', ') AS DOUBLE) AS sum_qty'])}
FROM lineitem
GROUP BY ROLLUP (l_returnflag)
""",
)
def agg_with_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``GROUP BY ... WITH TOTALS``: per-flag rows plus a totals row.
    Compiled as ROLLUP — Spark computes the totals from the partial
    aggregates in the same shuffle, not a second scan."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<totals>")).alias("returnflag"),
            "n",
            "sum_qty",
        )
    )


# --------------------------------------------------------------------------
# simpleLinearRegression + stddevPop from the same exact integer moments
# as agg_corr_exact (CH simpleLinearRegression / stddevPop / varPop).
# --------------------------------------------------------------------------


@query(
    "agg_linreg_exact",
    oracle="""
WITH z AS (
  SELECT l_returnflag,
    CAST(l_quantity AS BIGINT) AS x,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
  FROM lineitem
), s AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(x) AS DOUBLE) AS sx,
    CAST(SUM(y) AS DOUBLE) AS sy,
    CAST(SUM(x * x) AS DOUBLE) AS sxx,
    CAST(SUM(x * y) AS DOUBLE) AS sxy
  FROM z GROUP BY l_returnflag
)
SELECT l_returnflag,
  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_cents_per_unit,
  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept_cents,
  SQRT((n * sxx - sx * sx) / n) / n AS stddev_x_over_n
FROM s
""",
)
def agg_linreg_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH simpleLinearRegression(x, y) + stddevPop(x) per return flag, on
    integer-scaled inputs (price in cents), from exact integer moment sums —
    the same cross-engine-moment pattern as agg_corr_exact.  Every float op
    after the sums is a fixed expression tree both engines evaluate
    identically.  (stddev surfaced as stddev/n purely to keep the magnitude
    in a band where the shared division tree is the last op — the point is
    the exact-moment plumbing, not the units.)"""
    li = t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("bigint")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    z = li.select("l_returnflag", x.alias("x"), y.alias("y"))
    xx, yy = F.col("x"), F.col("y")
    wide = "decimal(38,0)"
    s = z.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xx).cast("double").alias("sx"),
        F.sum(yy).cast("double").alias("sy"),
        F.sum(xx * xx).cast("double").alias("sxx"),
        F.sum((xx * yy).cast(wide)).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    stddev_over_n = F.sqrt((n * sxx - sx * sx) / n) / n
    return s.select(
        "l_returnflag",
        slope.alias("slope_cents_per_unit"),
        intercept.alias("intercept_cents"),
        stddev_over_n.alias("stddev_x_over_n"),
    )


# --------------------------------------------------------------------------
# groupUniqArray (CH): distinct values per group as a sorted joined string
# (arrays can't be driver-hashed).
# --------------------------------------------------------------------------


@query(
    "agg_group_uniq_array",
    oracle="""
SELECT l_returnflag,
  string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
  COUNT(DISTINCT l_linestatus) AS n_statuses
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_group_uniq_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupUniqArray(l_linestatus) per return flag: collect_set -> sorted
    join.  collect_set partial-aggregates map-side, so the exchange carries
    per-partition distinct sets — bounded by value cardinality, not rows."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
            "statuses"
        ),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


# --------------------------------------------------------------------------
# UNPIVOT (wide -> long), the inverse of agg_pivot_event_counts.
# --------------------------------------------------------------------------


@query(
    "agg_unpivot_stack",
    oracle="""
SELECT o_orderkey, metric, val FROM (
  SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS val
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val
  FROM orders
)
""",
)
def agg_unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT two order measures into (metric, val) long form via stack()
    — a zero-shuffle generator projection (each input row emits its metric
    rows in place; the plan is scan -> generate, no exchange)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', CAST(o_totalprice AS DOUBLE), "
            "'custkey', CAST(o_custkey AS DOUBLE))"
        ).alias("metric", "val"),
    )


# --------------------------------------------------------------------------
# Gap filling with INTERPOLATE (CH ORDER BY ... WITH FILL INTERPOLATE):
# filled rows carry the previous present value forward.
# --------------------------------------------------------------------------


@query(
    "ts_gap_fill_interpolate",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
  FROM events
), hours AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
), types AS (SELECT DISTINCT event_type FROM events),
actual AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       CAST(COALESCE(LAST_VALUE(n IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS n_filled,
       (n IS NULL) AS is_filled
FROM (
  SELECT hours.h AS h, types.event_type AS event_type, actual.n AS n
  FROM hours CROSS JOIN types
  LEFT JOIN actual ON actual.h = hours.h AND actual.event_type = types.event_type
)
""",
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``ORDER BY h WITH FILL ... INTERPOLATE (n AS n)``: the dense spine
    of ts_gap_fill_hourly, but filled cells CARRY the previous present value
    forward (CH INTERPOLATE evaluates its expression on the prior row; the
    identity expr is last-observation-carried-forward).  Leading gaps before
    the first observation fall back to 0.  One ignore-nulls window per type
    over the dense grid — the grid is |hours| x |types|, never fact-table
    sized, so the window sort is trivially small at any SF."""
    ev = t(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h")
    )
    types = ev.select("event_type").distinct()
    actual = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), F.col("event_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grid = hours.crossJoin(F.broadcast(types)).join(
        F.broadcast(actual), ["h", "event_type"], "left"
    )
    return grid.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.coalesce(F.last("n", ignorenulls=True).over(w), F.lit(0)).alias(
            "n_filled"
        ),
        F.col("n").isNull().alias("is_filled"),
    )


# --------------------------------------------------------------------------
# Approximate quantiles (CH quantileTDigest / quantilesGK usage shape).
# Graduated to a hard oracle the portable-hash way (r4 sketch family
# policy): the APPROXIMATE path gated here is a deterministic 1-in-8
# hash-sampled discrete-rank quantile — integer arithmetic both engines
# replay exactly — next to the exact discrete-rank quantile on the full
# group.  The native GK sketch (approx_percentile) remains the production
# API for un-replayable accuracy tiers; its rank-error band stays
# pytest-pinned in tests/test_approx_sketches.py.
# --------------------------------------------------------------------------

_QUANTILE_RANKS = (50, 90, 99)


def _rank_quantile_aggs(prefix: str) -> list:
    """MAX(CASE WHEN rn = ceil(n*q/100) THEN cents END) per q — the
    discrete (lower) quantile at exact integer ranks; ceil via integer
    arithmetic so no float enters the rank computation."""
    return [
        F.max(
            F.when(
                F.col("rn")
                == F.greatest(F.lit(1), F.expr(f"(n * {q} + 99) div 100")),
                F.col("cents"),
            )
        ).alias(f"{prefix}_p{q}_cents")
        for q in _QUANTILE_RANKS
    ]


@query(
    "agg_quantile_approx",
    oracle="""
WITH base AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         l_orderkey, l_linenumber,
         (((l_orderkey % 2147483647) * 2654435761
            + l_linenumber * 40503) % 2147483647) % 8 = 0 AS in_sample
  FROM lineitem
), full_r AS (
  SELECT l_returnflag, cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cents, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM base
), samp_r AS (
  SELECT l_returnflag, cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cents, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM base WHERE in_sample
), f AS (
  SELECT l_returnflag,
    MAX(CASE WHEN rn = GREATEST(1, (n*50 + 99) // 100) THEN cents END) AS exact_p50_cents,
    MAX(CASE WHEN rn = GREATEST(1, (n*90 + 99) // 100) THEN cents END) AS exact_p90_cents,
    MAX(CASE WHEN rn = GREATEST(1, (n*99 + 99) // 100) THEN cents END) AS exact_p99_cents
  FROM full_r GROUP BY l_returnflag
), s AS (
  SELECT l_returnflag,
    MAX(CASE WHEN rn = GREATEST(1, (n*50 + 99) // 100) THEN cents END) AS approx_p50_cents,
    MAX(CASE WHEN rn = GREATEST(1, (n*90 + 99) // 100) THEN cents END) AS approx_p90_cents,
    MAX(CASE WHEN rn = GREATEST(1, (n*99 + 99) // 100) THEN cents END) AS approx_p99_cents
  FROM samp_r GROUP BY l_returnflag
)
SELECT f.l_returnflag,
       approx_p50_cents, approx_p90_cents, approx_p99_cents,
       exact_p50_cents, exact_p90_cents, exact_p99_cents
FROM f JOIN s USING (l_returnflag)
""",
)
def agg_quantile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic approximate quantiles per returnflag: discrete-rank
    p50/p90/p99 over a 1-in-8 portable-hash row sample (the bounded-memory
    scale path — the sample, not the full group, is sorted) next to the
    exact discrete-rank quantiles.  All arithmetic is integer (cents,
    integer-ceil ranks, mod-2^31-1 hash), so the values hash-match the
    DuckDB replay exactly.  At 100 TB the sort is a per-group window over
    the sampled eighth; accuracy tiers beyond sampling use the native GK
    sketch (approx_percentile), rank-error-pinned in pytest."""
    li = t(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "l_orderkey",
        "l_linenumber",
        # the key is pre-reduced mod 2^31-1 so the multiply stays under
        # 2^63 at ANY scale factor (l_orderkey alone would wrap at ~3.5e9)
        (
            F.pmod(
                F.pmod(
                    F.pmod(F.col("l_orderkey").cast("bigint"), F.lit(2147483647))
                    * F.lit(2654435761)
                    + F.col("l_linenumber").cast("bigint") * F.lit(40503),
                    F.lit(2147483647),
                ),
                F.lit(8),
            )
            == 0
        ).alias("in_sample"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")

    def ranked(df):
        return df.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(wn)
        )

    exact = ranked(base).groupBy("l_returnflag").agg(*_rank_quantile_aggs("exact"))
    approx = (
        ranked(base.filter("in_sample"))
        .groupBy("l_returnflag")
        .agg(*_rank_quantile_aggs("approx"))
    )
    return exact.join(approx, "l_returnflag").select(
        "l_returnflag",
        "approx_p50_cents", "approx_p90_cents", "approx_p99_cents",
        "exact_p50_cents", "exact_p90_cents", "exact_p99_cents",
    )


# --------------------------------------------------------------------------
# CH aggregate-function combinators: -If and -Array
# (sumIf/avgIf/minIf/maxIf/countIf; sumArray/minArray/maxArray/avgArray —
# ClickHouse docs/aggregate-functions/combinators).
# --------------------------------------------------------------------------


@query(
    "agg_if_combinators",
    oracle="""
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS count_if,
  CAST(SUM(CASE WHEN l_quantity > 25
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
    AS sum_if,
  CAST(SUM(CASE WHEN l_quantity > 25
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
    / SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS avg_if,
  MIN(CASE WHEN l_quantity > 25 THEN l_extendedprice END) AS min_if,
  MAX(CASE WHEN l_quantity > 25 THEN l_extendedprice END) AS max_if
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_if_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The -If combinator family in one shuffle: every conditional aggregate
    is a CASE projection folded into the same hash aggregate (CH compiles
    xxIf identically).  sum/avg run in exact decimal (determinism rules);
    min/max of raw doubles are order-independent as-is."""
    li = t(spark, sf_dir, "lineitem")
    cond = F.col("l_quantity") > 25
    price_dec = F.col("l_extendedprice").cast("decimal(18,2)")
    sum_dec = F.sum(F.when(cond, price_dec))
    n_if = F.sum(F.when(cond, 1).otherwise(0))
    return li.groupBy("l_returnflag").agg(
        n_if.cast("bigint").alias("count_if"),
        sum_dec.cast("double").alias("sum_if"),
        (sum_dec.cast("double") / n_if).alias("avg_if"),
        F.min(F.when(cond, F.col("l_extendedprice"))).alias("min_if"),
        F.max(F.when(cond, F.col("l_extendedprice"))).alias("max_if"),
    )


@query(
    "agg_array_combinators",
    oracle="""
SELECT label,
  CAST(SUM(list_aggregate(list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)), 'sum'))
       AS BIGINT) AS sum_array,
  CAST(MIN(list_aggregate(list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)), 'min'))
       AS BIGINT) AS min_elem,
  CAST(MAX(list_aggregate(list_transform(embedding,
        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)), 'max'))
       AS BIGINT) AS max_elem,
  CAST(SUM(LEN(embedding)) AS BIGINT) AS n_elems
FROM embeddings
GROUP BY label
""",
)
def agg_array_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The -Array combinator family (sumArray/minArray/maxArray) over the
    embedding column: per-row array reduction with higher-order functions
    (JVM-side, zero shuffle), then the ordinary group aggregate.  Elements
    are quantized to integers (floor(x*1000) — float32->double is exact, so
    both engines floor the same double) to keep the sums order-independent.
    Single-parameter lambdas only: a 2-parameter lambda passed to
    F.transform receives the array INDEX as its second argument."""
    e = t(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000).cast("bigint"),
    )
    row = e.select(
        "label",
        F.aggregate(
            q, F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("row_sum"),
        F.array_min(q).alias("row_min"),
        F.array_max(q).alias("row_max"),
        F.size("embedding").alias("row_n"),
    )
    return row.groupBy("label").agg(
        F.sum("row_sum").cast("bigint").alias("sum_array"),
        F.min("row_min").cast("bigint").alias("min_elem"),
        F.max("row_max").cast("bigint").alias("max_elem"),
        F.sum("row_n").cast("bigint").alias("n_elems"),
    )


# --------------------------------------------------------------------------
# Exact second/third moments: varPop / stddevPop / skewPop (CH
# aggregate-functions/reference).  Built from exact integer power sums so
# the final value is one fixed IEEE expression on identical inputs — the
# engines' builtin var_pop/skewness use different streaming accumulations
# and would never hash-match.
# --------------------------------------------------------------------------


@query(
    "agg_moments_exact",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s1,
    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS s2,
    CAST(SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS s3
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  (s2 / n) - (s1 / n) * (s1 / n) AS var_pop,
  SQRT((s2 / n) - (s1 / n) * (s1 / n)) AS stddev_pop,
  ((s3 / n) - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
    / (SQRT((s2 / n) - (s1 / n) * (s1 / n))
       * SQRT((s2 / n) - (s1 / n) * (s1 / n))
       * SQRT((s2 / n) - (s1 / n) * (s1 / n))) AS skew_pop
FROM s
""",
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """varPop/stddevPop/skewPop per return flag from exact integer power
    sums (l_quantity is integral: s1/s2 fit int64 at any realistic SF, s3
    is widened to decimal(38,0)).  Both engines then evaluate the SAME
    arithmetic tree on the SAME doubles — sqrt and power(x, 3) are exactly
    rounded/composed identically, so even the skewness hash-matches."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum((q * q * q).cast("decimal(38,0)")).cast("double").alias("s3"),
    )
    n, s1, s2, s3 = F.col("n"), F.col("s1"), F.col("s2"), F.col("s3")
    m = s1 / n
    var = (s2 / n) - m * m
    sd = F.sqrt(var)
    # sd*sd*sd, NOT pow(sd, 3): Java Math.pow and C libm pow disagree in the
    # last ulp; three explicit multiplies are bit-identical across engines
    skew = ((s3 / n) - F.lit(3) * m * (s2 / n) + F.lit(2) * m * m * m) / (
        sd * sd * sd
    )
    return s.select(
        "l_returnflag",
        var.alias("var_pop"),
        sd.alias("stddev_pop"),
        skew.alias("skew_pop"),
    )


@query(
    "agg_moving_window_arrays",
    oracle="""
WITH src AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem WHERE l_orderkey % 199 = 0
),
mv AS (
  SELECT l_returnflag, l_orderkey, l_linenumber, q,
         SUM(q) OVER (PARTITION BY l_returnflag
                      ORDER BY l_orderkey, l_linenumber, q
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS msum
  FROM src
)
SELECT l_returnflag,
       CAST(COUNT(*) AS INT) AS n,
       '[' || array_to_string(list(msum ORDER BY l_orderkey, l_linenumber,
           q, msum), ',') || ']' AS moving_sums,
       '[' || array_to_string(list(msum // 4 ORDER BY l_orderkey,
           l_linenumber, q, msum), ',') || ']' AS moving_avgs
FROM mv GROUP BY l_returnflag
""",
)
def agg_moving_window_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH groupArrayMovingSum(4) / groupArrayMovingAvg(4) semantics:
    per-group array of rolling 4-row sums (and CH's divide-by-window-SIZE
    integer average — window size, not current count, truncating division)
    in deterministic (l_orderkey, l_linenumber) order.  The moving sum is
    one window pass; the array collect runs on a modulus-bounded subset
    (CH's own groupArrayMovingSum materializes a group-sized array, so the
    operator is only sane on bounded groups — same discipline as
    groupArraySorted's pre-collect cap)."""
    from moosestack_spark.registry import canon_arrays

    li = t(spark, sf_dir, "lineitem").filter("l_orderkey % 199 = 0")
    src = li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    w = (
        # full tiebreak: the synthetic lineitem has duplicate
        # (l_orderkey, l_linenumber) pairs, and the frame order must be
        # total for the rolling sums to be engine-independent
        Window.partitionBy("l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "q")
        .rowsBetween(-3, 0)
    )
    mv = src.withColumn("msum", F.sum("q").over(w))
    out = mv.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("int").alias("n"),
        F.expr(
            "transform(array_sort(collect_list(struct(l_orderkey, "
            "l_linenumber, q, msum))), s -> s.msum)"
        ).alias("moving_sums"),
        F.expr(
            "transform(array_sort(collect_list(struct(l_orderkey, "
            "l_linenumber, q, msum))), s -> s.msum div 4)"
        ).alias("moving_avgs"),
    )
    return canon_arrays(out, "moving_sums", "moving_avgs")


# Shared moment-sum clause for the 2-feature OLS gate: x1/x2/y are exact
# integers, the nine sums are exact BIGINTs, and the normal-equation solve
# (Cramer's rule) happens in DOUBLE over those exact sums with one fixed
# expression tree — correctly-rounded *,-,/ make both engines agree
# bit-for-bit (the same discipline as agg_linreg_exact; bigint Cramer
# would overflow, double Cramer is deterministic).
_OLS_SUMS = """
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(x1) AS DOUBLE) AS s1,
         CAST(SUM(x2) AS DOUBLE) AS s2,
         CAST(SUM(y)  AS DOUBLE) AS sy,
         CAST(SUM(x1 * x1) AS DOUBLE) AS s11,
         CAST(SUM(x1 * x2) AS DOUBLE) AS s12,
         CAST(SUM(x2 * x2) AS DOUBLE) AS s22,
         CAST(SUM(x1 * y) AS DOUBLE) AS s1y,
         CAST(SUM(x2 * y) AS DOUBLE) AS s2y
  FROM (
    SELECT o_orderpriority,
           CAST(o_orderkey % 100 AS BIGINT) AS x1,
           CAST(o_orderkey % 37 AS BIGINT) AS x2,
           CAST(3 * (o_orderkey % 100) - 2 * (o_orderkey % 37)
                + o_orderkey % 11 AS BIGINT) AS y
    FROM orders WHERE o_orderkey % 3 = 0
  )
  GROUP BY o_orderpriority
"""

_OLS_SOLVE = """
SELECT o_orderpriority,
       (sy * (s11 * s22 - s12 * s12)
        - s1y * (s1 * s22 - s12 * s2)
        + s2y * (s1 * s12 - s11 * s2))
       / (n * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2)) AS b0,
       (n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2))
       / (n * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2)) AS b1,
       (n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2))
       / (n * (s11 * s22 - s12 * s12)
          - s1 * (s1 * s22 - s12 * s2)
          + s2 * (s1 * s12 - s11 * s2)) AS b2
FROM sums
ORDER BY o_orderpriority
"""


@query(
    "agg_ols_multifeature",
    oracle=f"WITH sums AS ({_OLS_SUMS})\n{_OLS_SOLVE}",
)
def agg_ols_multifeature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature ordinary least squares per group — the DETERMINISTIC
    closed form of CH's stochasticLinearRegression surface: y is planted
    as 3*x1 - 2*x2 + small residue, so b1/b2 land near (3, -2) while the
    residue keeps the system honest.  One grouped aggregation produces
    the nine exact moment sums; Cramer's rule runs in double over them
    with one fixed expression tree (replayed verbatim by the oracle).
    Scale: single map-side-combined groupBy, solve cost is per-GROUP."""
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["orders"])
    return spark.sql(f"WITH sums AS ({_OLS_SUMS})\n{_OLS_SOLVE}")
