"""Round-7 time-series operators: dyadic EWMA smoothing, Brown's double
exponential (Holt-shaped) forecast, integer-exact CUSUM changepoint, and
MAD-based anomaly flags.

ClickHouse parity: ``exponentialMovingAverage`` /
``exponentialTimeDecayedAvg`` (EWMA), the forecast shapes users build on
top of it, and the medianExact-based robust-outlier recipes the reference
exposes through its OlapTable SQL passthrough (SURVEY.md §2.4).

Determinism discipline (aggregates_stats.py header): EWMA recursions are
NOT window-expressible exactly (S_t depends on S_{t-1} with a float
multiplier), so each smoother here uses a TRUNCATED DYADIC KERNEL — an
8-term weight vector (2^7, 2^6, …, 2^0)/255 realized as an explicit
lag-chain of integer multiplies.  The weighted numerator is an exact
BIGINT; the single final division by the constant weight mass (255, or
255^2 for the cascaded smoother) is one correctly-rounded IEEE op over
identical operands — hash-exact doubles with zero order-dependence.
Truncation error vs the infinite EWMA kernel is <= (1/2)^8 of the weight
mass, documented as part of the operator contract rather than hidden.

CUSUM is the max-drawup identity: S_t = max(0, S_{t-1} + (x_t - mu))
equals P_t - min_{i<=t} P_i for the prefix sums P of (x_t - mu); scaling
by n clears the division (mu = T/n), so the whole statistic — including
the argmax day — is BIGINT-exact.

Scale: each gate aggregates to a per-day series first (map-side
combinable groupBy; the series is calendar-bounded — ~2.5k rows for 7
years — NOT row-count-bounded, so the single-partition ordered window
over the series stays O(days) at any SF; the cost center at 100 TB is
the upstream groupBy, which shuffles once on the date key).  MAD is two
cascaded groupBys + a broadcast join back — no sort of the raw sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

# Shared oracle prefix: daily order revenue in exact cents.
_DAILY_SQL = """
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  GROUP BY CAST(o_orderdate AS DATE)
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )


def _dyadic_numerator(col: str, w: Window) -> F.Column:
    """Sum_{k=0..7} lag(col, k) * 2^(7-k) — exact BIGINT, full windows
    only (callers filter rn >= 8)."""
    expr = F.col(col) * F.lit(128)
    for k in range(1, 8):
        expr = expr + F.lag(col, k).over(w) * F.lit(1 << (7 - k))
    return expr


# --------------------------------------------------------------------------
# exponentialMovingAverage (CH aggregate-functions) — truncated dyadic
# kernel: ewma_t = (sum_{k=0..7} x_{t-k} * 2^(7-k)) / 255 over the daily
# revenue series.  The numerator is an exact bigint (order-independent);
# one final division by the constant mass.
# --------------------------------------------------------------------------


@query(
    "ts_ewma_smoothing",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
r AS (
  SELECT day, cents,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         cents * 128
           + LAG(cents, 1) OVER (ORDER BY day) * 64
           + LAG(cents, 2) OVER (ORDER BY day) * 32
           + LAG(cents, 3) OVER (ORDER BY day) * 16
           + LAG(cents, 4) OVER (ORDER BY day) * 8
           + LAG(cents, 5) OVER (ORDER BY day) * 4
           + LAG(cents, 6) OVER (ORDER BY day) * 2
           + LAG(cents, 7) OVER (ORDER BY day) * 1 AS num
  FROM d
)
SELECT strftime(day, '%Y-%m-%d') AS day, cents,
       CAST(num AS BIGINT) AS ewma_num,
       CAST(num AS DOUBLE) / 255 AS ewma_cents
FROM r WHERE rn >= 8
""",
)
def ts_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``exponentialMovingAverage``-shaped smoother over daily order
    revenue: 8-term dyadic kernel, integer-exact numerator."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    r = d.select(
        "day",
        "cents",
        F.row_number().over(w).alias("rn"),
        _dyadic_numerator("cents", w).alias("num"),
    )
    return r.filter(F.col("rn") >= 8).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        F.col("num").cast("bigint").alias("ewma_num"),
        (F.col("num").cast("double") / 255).alias("ewma_cents"),
    )


# --------------------------------------------------------------------------
# Brown's double exponential smoothing (the Holt-shaped linear-trend
# forecast built from two cascaded EWMAs): s1 = K*x, s2 = K*s1 for the
# same dyadic kernel K; level = 2*s1 - s2, trend = s1 - s2 (alpha=1/2),
# one-step forecast = level + trend.  Numerators stay BIGINT through the
# cascade (max ~2^51 at sf100); the final divisions by 255 / 255^2 are
# single IEEE ops.
# --------------------------------------------------------------------------


@query(
    "ts_holt_linear",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
r1 AS (
  SELECT day, cents,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         cents * 128
           + LAG(cents, 1) OVER (ORDER BY day) * 64
           + LAG(cents, 2) OVER (ORDER BY day) * 32
           + LAG(cents, 3) OVER (ORDER BY day) * 16
           + LAG(cents, 4) OVER (ORDER BY day) * 8
           + LAG(cents, 5) OVER (ORDER BY day) * 4
           + LAG(cents, 6) OVER (ORDER BY day) * 2
           + LAG(cents, 7) OVER (ORDER BY day) * 1 AS s1
  FROM d
),
r2 AS (
  SELECT day, rn, s1,
         s1 * 128
           + LAG(s1, 1) OVER (ORDER BY day) * 64
           + LAG(s1, 2) OVER (ORDER BY day) * 32
           + LAG(s1, 3) OVER (ORDER BY day) * 16
           + LAG(s1, 4) OVER (ORDER BY day) * 8
           + LAG(s1, 5) OVER (ORDER BY day) * 4
           + LAG(s1, 6) OVER (ORDER BY day) * 2
           + LAG(s1, 7) OVER (ORDER BY day) * 1 AS s2
  FROM r1 WHERE rn >= 8
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(2 * s1 * 255 - s2 AS BIGINT) AS level_num,
       CAST(s1 * 255 - s2 AS BIGINT) AS trend_num,
       CAST(2 * s1 * 255 - s2 AS DOUBLE) / 65025 AS level_cents,
       CAST(s1 * 255 - s2 AS DOUBLE) / 65025 AS trend_cents,
       CAST((2 * s1 * 255 - s2) + (s1 * 255 - s2) AS DOUBLE) / 65025
         AS forecast_cents
FROM r2 WHERE rn >= 15
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing over daily revenue: cascaded
    dyadic EWMAs -> level/trend/one-step forecast, integer-exact
    numerators."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    r1 = d.select(
        "day",
        "cents",
        F.row_number().over(w).alias("rn"),
        _dyadic_numerator("cents", w).alias("s1"),
    )
    r2 = r1.filter(F.col("rn") >= 8).select(
        "day",
        "rn",
        "s1",
        _dyadic_numerator("s1", w).alias("s2"),
    )
    lvl = 2 * F.col("s1") * 255 - F.col("s2")
    trd = F.col("s1") * 255 - F.col("s2")
    return r2.filter(F.col("rn") >= 15).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        lvl.cast("bigint").alias("level_num"),
        trd.cast("bigint").alias("trend_num"),
        (lvl.cast("double") / 65025).alias("level_cents"),
        (trd.cast("double") / 65025).alias("trend_cents"),
        ((lvl + trd).cast("double") / 65025).alias("forecast_cents"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint via the max-drawup identity, scaled integer-exact:
# with P'_t = sum_{i<=t} (n*x_i - T)  (T = total, so mean drift is
# cleared without division), S'_t = P'_t - min_{i<=t} P'_i equals
# n * CUSUM_t.  The changepoint is argmax S'_t (day tiebreak) — a fully
# BIGINT-deterministic argmax.
# --------------------------------------------------------------------------


@query(
    "ts_changepoint_cusum",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t_sum,
               CAST(COUNT(*) AS BIGINT) AS n FROM d),
p AS (
  SELECT day,
         SUM(n * cents - t_sum) OVER (ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS pfx
  FROM d, tot
),
s AS (
  SELECT day, pfx,
         pfx - MIN(pfx) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS cusum_scaled
  FROM p
),
rk AS (
  SELECT day, cusum_scaled,
         ROW_NUMBER() OVER (ORDER BY cusum_scaled DESC, day ASC) AS rk
  FROM s
)
SELECT strftime(day, '%Y-%m-%d') AS changepoint_day,
       CAST(cusum_scaled AS BIGINT) AS cusum_scaled,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days
FROM rk WHERE rk = 1
""",
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upward-shift CUSUM changepoint over daily revenue (integer-exact
    via the n-scaled max-drawup identity)."""
    d = _daily(spark, sf_dir)
    tot = d.agg(
        F.sum("cents").cast("bigint").alias("t_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    j = d.crossJoin(F.broadcast(tot))
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    p = j.select(
        "day",
        "n",
        F.sum(F.col("n") * F.col("cents") - F.col("t_sum"))
        .over(w_run)
        .alias("pfx"),
    )
    s = p.select(
        "day",
        "n",
        (F.col("pfx") - F.min("pfx").over(w_run)).alias("cusum_scaled"),
    )
    rk = s.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("cusum_scaled").desc(), F.col("day").asc())
        ),
    )
    return rk.filter(F.col("rk") == 1).select(
        F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
        F.col("cusum_scaled").cast("bigint").alias("cusum_scaled"),
        F.col("n").cast("bigint").alias("n_days"),
    )


# --------------------------------------------------------------------------
# MAD anomaly flags: per event_type, median (exact interpolated, cents ->
# half-integers) and MAD = median(|x - med|) (quarter-integers), both
# exact doubles; anomalies = count(|x - med| > 3 * MAD).  Two cascaded
# groupBys + broadcast joins back — never a global sort of the raw
# sample (medianExact / robust-outlier CH recipe).
# --------------------------------------------------------------------------


@query(
    "ts_anomaly_mad",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), med AS (
  SELECT event_type,
         quantile_cont(CAST(cents AS DOUBLE), 0.5) AS med
  FROM v GROUP BY event_type
), dev AS (
  SELECT v.event_type, v.cents, med.med,
         abs(CAST(v.cents AS DOUBLE) - med.med) AS adev
  FROM v JOIN med ON v.event_type = med.event_type
), mad AS (
  SELECT event_type, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       MAX(dev.med) AS median_cents,
       MAX(mad.mad) AS mad_cents,
       CAST(SUM(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalies,
       CAST(COUNT(*) AS BIGINT) AS n
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type
""",
)
def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier counts per event_type: exact median/MAD (cents),
    anomaly = |x - med| > 3*MAD."""
    v = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile(cast(cents as double), 0.5)").alias("med")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("cents").cast("double") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    j = dev.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.max("med").alias("median_cents"),
        F.max("mad").alias("mad_cents"),
        F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_anomalies"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# --------------------------------------------------------------------------
# Autocorrelation function (lags 1..7) of daily revenue — the CH
# `seriesPeriodDetect`-adjacent diagnostic users run before picking a
# seasonal window.  Exactness: deviations are taken from the FLOORED mean
# (mu = S div n — off by < 1 unit from the true mean, deterministic and
# replayed), in floored whole dollars so the lag-product sums stay BIGINT
# (|dev| <= ~1e5 at sf0.1 -> products*days ~ 1e13; int64-safe through
# sf~30).  acf is ONE final division per lag over exact integers.
# --------------------------------------------------------------------------


@query(
    "ts_autocorrelation",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
dol AS (
  SELECT day, cents // 100 AS x FROM d
),
mu AS (
  SELECT (SUM(x) - (((SUM(x) % COUNT(*)) + COUNT(*)) % COUNT(*)))
           // COUNT(*) AS m
  FROM dol
),
dev AS (
  SELECT day, x - (SELECT m FROM mu) AS dv FROM dol
),
lagged AS (
  SELECT lag.k, dev.dv * LAG(dev.dv, lag.k) OVER (PARTITION BY lag.k ORDER BY dev.day) AS prod,
         dev.dv * dev.dv AS sq
  FROM dev CROSS JOIN (SELECT UNNEST(range(1, 8)) AS k) lag
)
SELECT k AS lag, CAST(SUM(prod) AS BIGINT) AS num,
       CAST(SUM(sq) AS BIGINT) AS den,
       CAST(SUM(prod) AS DOUBLE) / CAST(SUM(sq) AS DOUBLE) AS acf
FROM lagged GROUP BY k
""",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACF at lags 1..7 of daily order revenue in floored dollars around
    the floored mean: num = sum(dv_t * dv_{t-k}), den = sum(dv^2) (the
    full-series denominator; NULL lag products drop from num exactly as
    the oracle's SUM ignores them).  Series is calendar-bounded, so the
    per-lag ordered window is O(days) at any SF."""
    d = _daily(spark, sf_dir).select("day", F.expr("cents div 100").alias("x"))
    agg = d.agg(
        F.expr("(sum(x) - pmod(sum(x), count(*))) div count(*)").alias("m")
    )
    dev = d.crossJoin(F.broadcast(agg)).select(
        "day", (F.col("x") - F.col("m")).alias("dv")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("k"))
    lagged = dev.crossJoin(F.broadcast(lags))
    w = Window.partitionBy("k").orderBy("day")
    # per-lag product via a rank self-shift: lag(dv, k) needs a dynamic
    # offset, which Spark's lag() can't take — use rn-k join instead
    rn = lagged.withColumn("rn", F.row_number().over(w))
    cur = rn.select("k", "rn", "dv")
    prev = rn.select(
        F.col("k").alias("k2"), (F.col("rn") + F.col("k")).alias("rn2"),
        F.col("dv").alias("dv_prev"),
    )
    joined = cur.join(
        prev, (cur.k == prev.k2) & (cur.rn == prev.rn2), "left"
    )
    return (
        joined.groupBy("k")
        .agg(
            F.sum(F.col("dv") * F.col("dv_prev")).cast("bigint").alias("num"),
            F.sum(F.col("dv") * F.col("dv")).cast("bigint").alias("den"),
        )
        .select(
            F.col("k").alias("lag"),
            "num",
            "den",
            (F.col("num").cast("double") / F.col("den").cast("double")).alias(
                "acf"
            ),
        )
    )


# --------------------------------------------------------------------------
# Classical additive seasonal decomposition with a weekly period: seasonal
# = floored day-of-week mean of the detrended-free series, trend = centered
# 7-day moving average (integer sum div 7 over full windows), residual =
# x - trend - (seasonal - overall floored mean).  Every component is exact
# BIGINT arithmetic (floored means documented as the contract).
# --------------------------------------------------------------------------


@query(
    "ts_seasonal_decompose",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
r AS (
  SELECT day, cents,
         ROW_NUMBER() OVER (ORDER BY day) AS rn,
         COUNT(*) OVER () AS n,
         dayofweek(day) AS dow,
         SUM(cents) OVER (ORDER BY day
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_sum,
         COUNT(*) OVER (ORDER BY day
           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_n
  FROM d
),
dowm AS (
  SELECT dow,
         (SUM(cents) - (((SUM(cents) % COUNT(*)) + COUNT(*)) % COUNT(*)))
           // COUNT(*) AS dow_mean
  FROM r GROUP BY dow
),
mu AS (
  SELECT (SUM(cents) - (((SUM(cents) % COUNT(*)) + COUNT(*)) % COUNT(*)))
           // COUNT(*) AS m
  FROM r
)
SELECT strftime(r.day, '%Y-%m-%d') AS day, r.cents,
       CAST(dowm.dow_mean - (SELECT m FROM mu) AS BIGINT) AS seasonal,
       CAST(CASE WHEN r.win_n = 7 THEN
         (r.win_sum - (((r.win_sum % 7) + 7) % 7)) // 7 END AS BIGINT)
         AS trend,
       CAST(CASE WHEN r.win_n = 7 THEN
         r.cents - (r.win_sum - (((r.win_sum % 7) + 7) % 7)) // 7
           - (dowm.dow_mean - (SELECT m FROM mu)) END AS BIGINT) AS resid
FROM r JOIN dowm USING (dow)
""",
)
def ts_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive weekly decomposition of daily revenue: seasonal = floored
    day-of-week mean minus floored overall mean, trend = centered 7-day
    moving average over FULL windows only (edges NULL), residual = x -
    trend - seasonal.  All BIGINT-exact via floored means."""
    d = _daily(spark, sf_dir)
    wo = Window.orderBy("day")
    r = d.select(
        "day",
        "cents",
        F.dayofweek("day").alias("dow"),
        F.sum("cents").over(wo.rowsBetween(-3, 3)).alias("win_sum"),
        F.count(F.lit(1)).over(wo.rowsBetween(-3, 3)).alias("win_n"),
    )
    dowm = r.groupBy("dow").agg(
        F.expr(
            "(sum(cents) - pmod(sum(cents), count(*))) div count(*)"
        ).alias("dow_mean")
    )
    mu = r.agg(
        F.expr("(sum(cents) - pmod(sum(cents), count(*))) div count(*)").alias("m")
    )
    out = (
        r.join(F.broadcast(dowm), "dow")
        .crossJoin(F.broadcast(mu))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            (F.col("dow_mean") - F.col("m")).cast("bigint").alias("seasonal"),
            F.when(
                F.col("win_n") == 7,
                F.expr("(win_sum - pmod(win_sum, 7)) div 7"),
            ).cast("bigint").alias("trend"),
            F.when(
                F.col("win_n") == 7,
                F.col("cents")
                - F.expr("(win_sum - pmod(win_sum, 7)) div 7")
                - (F.col("dow_mean") - F.col("m")),
            ).cast("bigint").alias("resid"),
        )
    )
    return out


# --------------------------------------------------------------------------
# Seasonal-naive forecast skill: compare the weekly seasonal-naive
# predictor (x_{t-7}) against the naive-1 predictor (x_{t-1}) over the
# daily series — the MASE-style ratio every forecast pipeline baselines
# against before trusting a model.  Absolute-error sums are exact BIGINTs
# over full-lag rows; the ratio is one final division.
# --------------------------------------------------------------------------


@query(
    "ts_seasonal_naive_skill",
    oracle=f"""
WITH d AS ({_DAILY_SQL}),
r AS (
  SELECT day, cents,
         LAG(cents, 7) OVER (ORDER BY day) AS l7,
         LAG(cents, 1) OVER (ORDER BY day) AS l1,
         ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(ABS(cents - l7)) AS BIGINT) AS snaive_abs_err,
       CAST(SUM(ABS(cents - l1)) AS BIGINT) AS naive_abs_err,
       CAST(SUM(ABS(cents - l7)) AS DOUBLE)
         / CAST(SUM(ABS(cents - l1)) AS DOUBLE) AS mase
FROM r WHERE rn >= 8
""",
)
def ts_seasonal_naive_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE-style skill of the weekly seasonal-naive predictor vs naive-1
    over daily revenue (full-lag rows only, exact integer error sums)."""
    d = _daily(spark, sf_dir)
    w = Window.orderBy("day")
    r = d.select(
        "cents",
        F.lag("cents", 7).over(w).alias("l7"),
        F.lag("cents", 1).over(w).alias("l1"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") >= 8)
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.abs(F.col("cents") - F.col("l7"))).cast("bigint").alias(
            "snaive_abs_err"
        ),
        F.sum(F.abs(F.col("cents") - F.col("l1"))).cast("bigint").alias(
            "naive_abs_err"
        ),
        (
            F.sum(F.abs(F.col("cents") - F.col("l7"))).cast("double")
            / F.sum(F.abs(F.col("cents") - F.col("l1"))).cast("double")
        ).alias("mase"),
    )
