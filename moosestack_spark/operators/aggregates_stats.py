"""Statistical / interval aggregates: intervalLengthSum, entropy, covar, kurt.

ClickHouse parity (reference exposes the full CH aggregate surface through
its OlapTable SQL passthrough — apps/framework-cli templates use
intervalLengthSum / entropy / covarPop / kurtPop for session coverage and
distribution diagnostics; SURVEY.md §2.4):

- ``intervalLengthSum``: total length of the union of (possibly
  overlapping) per-key intervals — the classic gaps-and-islands merge, here
  as one window pass + one groupBy (no self-join: CH computes it in a
  single pass per key and so do we);
- ``entropy``: Shannon entropy of a value distribution per group;
- ``covarPop`` / ``kurtPop``: exact population covariance / kurtosis from
  integer power sums (same discipline as agg_moments_exact — both engines
  evaluate an identical arithmetic tree over identical doubles).

Float determinism notes:
- covar/kurt inputs are integral (quantity) or fixed-point (extendedprice
  -> integer cents), so every sum is EXACT; the only doubles are final
  divisions/multiplies of identical values — deterministic.
- entropy needs log2, and Java's and libm's log2 disagree in the last ulp
  (~34% of integer inputs, measured) — so the surfaced entropy is cast to
  FLOAT (float32): a 1-2 ulp double discrepancy is ~1e-16 relative, nine
  orders of magnitude below float32's 6e-8 resolution, so both engines
  round to the same float.  This is the one sanctioned use of precision
  reduction (cast, not round — _determinism.py forbids rounding computed
  doubles because HALF_UP boundaries differ; float cast is IEEE
  round-nearest-even in both engines).

Scale: intervalLengthSum is one shuffle on the key (the window) + a
map-side-combinable groupBy; entropy is two cascaded groupBys (key,value ->
key), both partial-aggregated; covar/kurt are single-shuffle groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

INTERVAL_SEC = 300


@query(
    "agg_interval_length_sum",
    oracle=f"""
WITH iv AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + {INTERVAL_SEC} AS e
  FROM events
),
marked AS (
  SELECT user_id, s, e,
    CASE WHEN s > COALESCE(MAX(e) OVER (
         PARTITION BY user_id ORDER BY s, e
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -9223372036854775808)
         THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT user_id, s, e,
    SUM(new_island) OVER (
      PARTITION BY user_id ORDER BY s, e
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
),
merged AS (
  SELECT user_id, island, MAX(e) - MIN(s) AS len
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS covered_sec,
       CAST(COUNT(*) AS BIGINT) AS n_islands
FROM merged GROUP BY user_id
""",
)
def agg_interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intervalLengthSum(ts, ts+5min) per user: length of the union of the
    user's activity intervals plus the merged-interval count.  Single
    window pass (gaps-and-islands: an interval starts a new island when its
    start exceeds the running max end of all earlier intervals), then two
    map-side-combinable groupBys — no self-join, no explode.

    ClickHouse parity: intervalLengthSum; cite
    reference/apps/framework-docs (CH function surface passthrough)."""
    ev = t(spark, sf_dir, "events")
    s = F.unix_timestamp("ts").cast("bigint")
    iv = ev.select("user_id", s.alias("s"), (s + INTERVAL_SEC).alias("e"))
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s")
            > F.coalesce(F.max("e").over(w_prev), F.lit(-(2**63))),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("len")
    )
    return merged.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("covered_sec"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
    )


@query(
    "agg_entropy",
    oracle="""
WITH c AS (
  SELECT user_id % 10 AS cohort, event_type, COUNT(*) AS n
  FROM events GROUP BY user_id % 10, event_type
),
tot AS (
  SELECT cohort,
         CAST(SUM(n) AS BIGINT) AS total,
         SUM(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE))) AS nlogn
  FROM c GROUP BY cohort
)
SELECT cohort,
       CAST(log2(CAST(total AS DOUBLE)) - nlogn / total AS FLOAT) AS entropy
FROM tot
""",
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the event-type distribution per user
    cohort: H = log2(N) - sum(c*log2(c))/N over exact integer counts.
    Surfaced as float32 — see the module docstring for why (cross-engine
    log2 last-ulp divergence is absorbed by the float cast; counts and N
    are exact).  ClickHouse parity: entropy()."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("double")
    tot = c.groupBy("cohort").agg(
        F.sum("n").cast("bigint").alias("total"),
        F.sum(nd * F.log2(nd)).alias("nlogn"),
    )
    return tot.select(
        "cohort",
        (F.log2(F.col("total").cast("double")) - F.col("nlogn") / F.col("total"))
        .cast("float")
        .alias("entropy"),
    )


@query(
    "agg_covar_kurt",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS q1,
    CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS DOUBLE) AS q2,
    CAST(SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
                  * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS q3,
    CAST(SUM(CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))
             * CAST(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS q4,
    CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(25,4)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS c1,
    CAST(SUM(CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(38,0))
             * CAST(CAST(CAST(l_extendedprice AS DECIMAL(25,4)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS qc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  (qc / n - (q1 / n) * (c1 / n)) / 10000.0 AS covar_pop,
  (q4 / n
   - 4 * (q1 / n) * (q3 / n)
   + 6 * (q1 / n) * (q1 / n) * (q2 / n)
   - 3 * (q1 / n) * (q1 / n) * (q1 / n) * (q1 / n))
  / (((q2 / n) - (q1 / n) * (q1 / n)) * ((q2 / n) - (q1 / n) * (q1 / n))) AS kurt_pop
FROM s
""",
)
def agg_covar_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """covarPop(l_quantity, l_extendedprice) and kurtPop(l_quantity) per
    return flag from exact integer power sums (price widened to integer
    cents via the fixed-point decimal cast; q4 and cross products widened
    to decimal(38,0) so sums stay exact at any SF).  The covariance is
    computed in cents-units then divided once by 1e4 — one extra exact
    IEEE division, identical in both engines.  ClickHouse parity:
    covarPop / kurtPop."""
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("bigint")
    cents = (F.col("l_extendedprice").cast("decimal(25,4)") * 100).cast("bigint")
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("q1"),
        F.sum(q * q).cast("double").alias("q2"),
        F.sum(d38(q * q * q)).cast("double").alias("q3"),
        F.sum(d38(q * q) * d38(q * q)).cast("double").alias("q4"),
        F.sum(d38(cents)).cast("double").alias("c1"),
        F.sum(d38(q) * d38(cents)).cast("double").alias("qc"),
    )
    n = F.col("n")
    m1, m2, m3, m4 = (F.col(c) / n for c in ("q1", "q2", "q3", "q4"))
    mc, mqc = F.col("c1") / n, F.col("qc") / n
    var = m2 - m1 * m1
    covar = (mqc - m1 * mc) / F.lit(10000.0)
    kurt = (m4 - F.lit(4) * m1 * m3 + F.lit(6) * m1 * m1 * m2 - F.lit(3) * m1 * m1 * m1 * m1) / (
        var * var
    )
    return s.select(
        "l_returnflag", covar.alias("covar_pop"), kurt.alias("kurt_pop")
    )


# --------------------------------------------------------------------------
# maxIntersections / maxIntersectionsPosition (CH parametric aggregates):
# the maximum number of simultaneously-open intervals and the sweep point
# where that maximum is first reached.  Classic sweep-line as ONE window
# pass: +1 at each interval start, -1 at each end (ends sort before starts
# on ties — CH intervals are half-open [start, end)), running sum, argmax.
# Per-group state is the sorted sweep within the group's window partition —
# a single exchange on the group key at any volume.
# --------------------------------------------------------------------------


@query(
    "agg_max_intersections",
    oracle="""
WITH iv AS (
  SELECT event_type, ts AS s, ts + INTERVAL 1 HOUR AS e
  FROM events
), sweep AS (
  SELECT event_type, t, d,
         SUM(d) OVER (PARTITION BY event_type ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS open_n
  FROM (
    SELECT event_type, s AS t, 1 AS d FROM iv
    UNION ALL
    SELECT event_type, e AS t, -1 AS d FROM iv
  )
)
SELECT event_type,
       CAST(MAX(open_n) AS BIGINT) AS max_intersections,
       strftime(MIN(CASE WHEN open_n = mx THEN t END),
                '%Y-%m-%d %H:%M:%S.%f') AS first_max_at
FROM (SELECT *, MAX(open_n) OVER (PARTITION BY event_type) AS mx FROM sweep)
GROUP BY event_type
""",
)
def agg_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, the peak number of concurrently-open 1-hour event
    intervals and the first sweep position reaching that peak.  Tie rule:
    an interval ending exactly where another starts does NOT overlap it
    (d = -1 sorts before +1 at equal t)."""
    ev = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").alias("s"), (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("e")
    )
    pts = ev.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        ev.select("event_type", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sweep = pts.withColumn("open_n", F.sum("d").over(w)).withColumn(
        "mx", F.max("open_n").over(Window.partitionBy("event_type"))
    )
    return sweep.groupBy("event_type").agg(
        F.max("open_n").cast("bigint").alias("max_intersections"),
        F.date_format(
            F.min(F.when(F.col("open_n") == F.col("mx"), F.col("t"))),
            "yyyy-MM-dd HH:mm:ss.SSSSSS",
        ).alias("first_max_at"),
    )


# --------------------------------------------------------------------------
# groupArraySorted(N) / groupConcat (CH aggregate-functions): the N
# smallest values per group as a sorted array, and an order-deterministic
# string concatenation.  Scale shape: a rank window PRUNES to N rows per
# group BEFORE the collect (collect_list over a whole 100 TB group would
# OOM; after the prune the collected array is N-bounded by construction).
# The window and the groupBy share the same key exchange.
# --------------------------------------------------------------------------


@query(
    "agg_group_array_sorted",
    oracle="""
SELECT l_returnflag,
       '[' || array_to_string(list_sort(list(price)), ',') || ']'
         AS smallest5,
       array_to_string(list_sort(list(price)), ',') AS joined5
FROM (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY CAST(l_extendedprice AS DECIMAL(12,2)) ASC,
                    l_orderkey ASC, l_linenumber ASC) AS rn
  FROM lineitem
) WHERE rn <= 5
GROUP BY l_returnflag
""",
)
def agg_group_array_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``groupArraySorted(5)(price)`` + ``groupConcat`` per returnflag:
    the five smallest prices as a sorted array and a comma-joined string.
    Exact-decimal prices; (orderkey, linenumber) tiebreak makes the pruned
    row set total-order deterministic."""
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("price").asc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    pruned = (
        li.select("l_returnflag", price.alias("price"), "l_orderkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )
    from moosestack_spark.registry import canon_arrays

    # Driver-canon contract: oracled gates must emit only scalar columns
    # (the driver's pandas canonicalizer can't sort list cells) — the
    # array serializes through the shared canon_arrays helper.
    out = pruned.groupBy("l_returnflag").agg(
        F.array_sort(F.collect_list("price")).alias("smallest5"),
        F.array_join(F.array_sort(F.collect_list("price")), ",").alias("joined5"),
    )
    return canon_arrays(out, "smallest5")


# --------------------------------------------------------------------------
# welchTTest / studentTTest (CH aggregate-functions): the t statistic and
# Welch–Satterthwaite degrees of freedom between two samples, computed
# from exact integer power sums (value widened to cents) — every sum is
# exact, the final arithmetic evaluates an identical expression tree over
# identical doubles in both engines, and sqrt is correctly rounded, so
# even the DOUBLE statistic hash-matches (no FLOAT downcast needed;
# p-values need an incomplete-beta and are out of SQL scope — CH callers
# threshold on |t| with df in practice).
# --------------------------------------------------------------------------


@query(
    "agg_welch_ttest",
    oracle="""
WITH s AS (
  SELECT
    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS s1,
    CAST(SUM(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT)) AS DOUBLE) AS s2
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
), w AS (
  SELECT
    MAX(CASE WHEN grp = 1 THEN n END) AS n1,
    MAX(CASE WHEN grp = 1 THEN s1 END) AS a1,
    MAX(CASE WHEN grp = 1 THEN s2 END) AS q1,
    MAX(CASE WHEN grp = 0 THEN n END) AS n2,
    MAX(CASE WHEN grp = 0 THEN s1 END) AS a2,
    MAX(CASE WHEN grp = 0 THEN s2 END) AS q2
  FROM s
)
SELECT
  (a1 / n1 - a2 / n2)
    / sqrt((q1 - a1 * a1 / n1) / (n1 - 1) / n1
           + (q2 - a2 * a2 / n2) / (n2 - 1) / n2) AS t_stat,
  ((q1 - a1 * a1 / n1) / (n1 - 1) / n1 + (q2 - a2 * a2 / n2) / (n2 - 1) / n2)
  * ((q1 - a1 * a1 / n1) / (n1 - 1) / n1 + (q2 - a2 * a2 / n2) / (n2 - 1) / n2)
  / ((q1 - a1 * a1 / n1) / (n1 - 1) / n1 * ((q1 - a1 * a1 / n1) / (n1 - 1) / n1)
       / (n1 - 1)
     + (q2 - a2 * a2 / n2) / (n2 - 1) / n2 * ((q2 - a2 * a2 / n2) / (n2 - 1) / n2)
       / (n2 - 1)) AS welch_df,
  CAST(n1 AS BIGINT) AS n_purchase,
  CAST(n2 AS BIGINT) AS n_click
FROM w
""",
)
def agg_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's t between purchase and click event values (cents-exact power
    sums; the t statistic and Welch–Satterthwaite df surface as hash-exact
    DOUBLEs — see section comment)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    s = ev.groupBy(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("grp")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(cents).cast("double").alias("s1"),
        F.sum(cents * cents).cast("double").alias("s2"),
    )
    w = s.agg(
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s1"))).alias("a1"),
        F.max(F.when(F.col("grp") == 1, F.col("s2"))).alias("q1"),
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n2"),
        F.max(F.when(F.col("grp") == 0, F.col("s1"))).alias("a2"),
        F.max(F.when(F.col("grp") == 0, F.col("s2"))).alias("q2"),
    )
    v1 = (F.col("q1") - F.col("a1") * F.col("a1") / F.col("n1")) / (
        F.col("n1") - 1
    ) / F.col("n1")
    v2 = (F.col("q2") - F.col("a2") * F.col("a2") / F.col("n2")) / (
        F.col("n2") - 1
    ) / F.col("n2")
    tstat = (F.col("a1") / F.col("n1") - F.col("a2") / F.col("n2")) / F.sqrt(v1 + v2)
    wdf = (v1 + v2) * (v1 + v2) / (
        v1 * v1 / (F.col("n1") - 1) + v2 * v2 / (F.col("n2") - 1)
    )
    return w.select(
        tstat.alias("t_stat"),
        wdf.alias("welch_df"),
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
    )


# --------------------------------------------------------------------------
# mannWhitneyUTest (CH aggregate-functions): the U statistic with
# tie-averaged ranks.  Ranks are computed over the DISTINCT-VALUE
# histogram (counts per value per group, then a prefix sum over sorted
# distinct values), so the only ordered pass is distinct-value-sized —
# never a global sort of the raw sample.  Tie-averaged ranks are
# half-integers and counts are exact, so U is a hash-exact DOUBLE.
# --------------------------------------------------------------------------


@query(
    "agg_mann_whitney_u",
    oracle="""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY CAST(round(value * 100) AS BIGINT)
), r AS (
  SELECT v, n1, nt,
         COALESCE(SUM(nt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below,
         (COALESCE(SUM(nt) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + CAST(nt + 1 AS DOUBLE) / 2) AS avg_rank
  FROM h
)
SELECT SUM(n1 * avg_rank)
         - CAST(SUM(n1) AS DOUBLE) * (CAST(SUM(n1) AS DOUBLE) + 1) / 2
         AS u1,
       (SUM(n1 * avg_rank)
         - CAST(SUM(n1) AS DOUBLE) * (CAST(SUM(n1) AS DOUBLE) + 1) / 2)
         / (CAST(SUM(n1) AS DOUBLE) * (CAST(SUM(nt) AS DOUBLE) - SUM(n1)))
         AS auc,
       CAST(SUM(n1) AS BIGINT) AS n_purchase,
       CAST(SUM(nt) - SUM(n1) AS BIGINT) AS n_click
FROM r
""",
)
def agg_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (purchase vs click event values, cents-quantized):
    U1 = sum of purchase tie-averaged ranks minus n1(n1+1)/2 — plus the
    AUC identity U1/(n1*n2): the probability a random purchase value
    outranks a random click value, i.e. the ROC-AUC of `value` as a
    purchase-vs-click classifier (ties count half)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    h = ev.groupBy(cents.alias("v")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("bigint").alias("n1"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = h.withColumn(
        "avg_rank",
        F.coalesce(F.sum("nt").over(w_below), F.lit(0))
        + (F.col("nt") + 1).cast("double") / 2,
    )
    u1 = (
        F.sum(F.col("n1") * F.col("avg_rank"))
        - F.sum("n1").cast("double") * (F.sum("n1").cast("double") + 1) / 2
    )
    n2 = F.sum("nt").cast("double") - F.sum("n1")
    return r.agg(
        u1.alias("u1"),
        (u1 / (F.sum("n1").cast("double") * n2)).alias("auc"),
        F.sum("n1").cast("bigint").alias("n_purchase"),
        (F.sum("nt") - F.sum("n1")).cast("bigint").alias("n_click"),
    )


# --------------------------------------------------------------------------
# kolmogorovSmirnovTest (CH aggregate-functions): the KS D statistic =
# max |F1(v) - F2(v)| over the pooled support.  Same distinct-value
# histogram scaffold as Mann-Whitney; the deviation is maximized on the
# EXACT integer cross product |c1*n2 - c2*n1| (no division until the one
# final d = num/(n1*n2)), so the argmax is integer-deterministic and the
# emitted D hash-matches as DOUBLE.
# --------------------------------------------------------------------------


@query(
    "agg_ks_test",
    oracle="""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY CAST(round(value * 100) AS BIGINT)
), c AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f1,
         SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS f2
  FROM h
), tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM h)
SELECT CAST(MAX(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS d_num,
       CAST(MAX(n1) * MAX(n2) AS BIGINT) AS d_den,
       CAST(MAX(abs(f1 * n2 - f2 * n1)) AS DOUBLE)
         / (CAST(MAX(n1) AS DOUBLE) * MAX(n2)) AS d_stat
FROM c, tot
""",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between purchase and click value
    distributions (cents-quantized), surfaced as the exact integer
    num/den pair plus the double ratio."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    h = ev.groupBy(cents.alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    c = h.select(
        "v",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    tot = h.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    joined = c.join(F.broadcast(tot))
    return joined.agg(
        F.max(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
        .cast("bigint")
        .alias("d_num"),
        (F.max("n1") * F.max("n2")).cast("bigint").alias("d_den"),
        (
            F.max(
                F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1"))
            ).cast("double")
            / (F.max("n1").cast("double") * F.max("n2"))
        ).alias("d_stat"),
    )


# --------------------------------------------------------------------------
# cramersV (CH aggregate-functions): association between two categorical
# columns from the contingency table.  Counts and marginals are exact
# integers; chi-square accumulates (o - e)^2/e over ~|r x c| cells in
# engine-dependent order, so the statistic surfaces as FLOAT (the
# sanctioned transcendental/accumulation policy).  Two map-side-combined
# aggregations — cells, then the scalar.
# --------------------------------------------------------------------------


@query(
    "agg_cramers_v",
    oracle="""
WITH cell AS (
  SELECT event_type AS a, user_id % 7 AS b, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, user_id % 7
), marg AS (
  SELECT a, b, o,
         SUM(o) OVER (PARTITION BY a) AS ra,
         SUM(o) OVER (PARTITION BY b) AS cb,
         SUM(o) OVER () AS n
  FROM cell
), chi AS (
  SELECT SUM((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
             * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
             / (CAST(ra AS DOUBLE) * cb / n)) AS chi2,
         MAX(n) AS n,
         COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
  FROM marg
)
SELECT CAST(sqrt(chi2 / (n * LEAST(r - 1, c - 1))) AS FLOAT) AS cramers_v,
       CAST(chi2 AS FLOAT) AS chi2,
       CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
       CAST(n AS BIGINT) AS n
FROM chi
""",
)
def agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between event type and a 7-way user cohort, with the
    underlying chi-square statistic and its degrees of freedom."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("a"), (F.col("user_id") % 7).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    marg = cell.select(
        "a",
        "b",
        "o",
        F.sum("o").over(Window.partitionBy("a")).alias("ra"),
        F.sum("o").over(Window.partitionBy("b")).alias("cb"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    chi = marg.agg(
        F.sum((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e)
        .alias("chi2"),
        F.max("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    return chi.select(
        F.sqrt(
            F.col("chi2")
            / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
        )
        .cast("float")
        .alias("cramers_v"),
        F.col("chi2").cast("float").alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
        F.col("n").cast("bigint").alias("n"),
    )


@query(
    "agg_theils_u",
    oracle="""
WITH cell AS (
  SELECT event_type AS a, user_id % 7 AS b, CAST(COUNT(*) AS BIGINT) AS nab
  FROM events GROUP BY event_type, user_id % 7
), parts AS (
  SELECT
    SUM(CAST(nab AS DOUBLE) * log2(CAST(nab AS DOUBLE))) AS sab,
    CAST(SUM(nab) AS BIGINT) AS n
  FROM cell
), amarg AS (
  SELECT SUM(CAST(na AS DOUBLE) * log2(CAST(na AS DOUBLE))) AS sa
  FROM (SELECT SUM(nab) AS na FROM cell GROUP BY a)
), bmarg AS (
  SELECT SUM(CAST(nb AS DOUBLE) * log2(CAST(nb AS DOUBLE))) AS sb
  FROM (SELECT SUM(nab) AS nb FROM cell GROUP BY b)
)
SELECT CAST(
  (log2(CAST(n AS DOUBLE)) - sa / n - ((sb - sab) / n))
  / (log2(CAST(n AS DOUBLE)) - sa / n) AS FLOAT) AS theils_u,
  CAST(log2(CAST(n AS DOUBLE)) - sa / n - sb / n + sab / n AS FLOAT)
    AS mutual_info,
  CAST(n AS BIGINT) AS n
FROM parts, amarg, bmarg
""",
)
def agg_theils_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil's U (uncertainty coefficient) U(event_type | user cohort)
    plus the mutual information I(a;b) = H(a)+H(b)-H(a,b) in bits —
    everything from exact integer contingency counts with the n*log2(n)
    spelling (same FLOAT-surface policy as agg_entropy);
    H(a|b) = (sum_b nb log nb - sum_ab nab log nab)/N."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("a"), (F.col("user_id") % 7).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("nab"))
    nd = lambda c: F.col(c).cast("double")  # noqa: E731
    parts = cell.agg(
        F.sum(nd("nab") * F.log2(nd("nab"))).alias("sab"),
        F.sum("nab").cast("bigint").alias("n"),
    )
    amarg = (
        cell.groupBy("a")
        .agg(F.sum("nab").alias("na"))
        .agg(F.sum(nd("na") * F.log2(nd("na"))).alias("sa"))
    )
    bmarg = (
        cell.groupBy("b")
        .agg(F.sum("nab").alias("nb"))
        .agg(F.sum(nd("nb") * F.log2(nd("nb"))).alias("sb"))
    )
    j = parts.join(F.broadcast(amarg)).join(F.broadcast(bmarg))
    ha = F.log2(nd("n")) - F.col("sa") / F.col("n")
    hab = (F.col("sb") - F.col("sab")) / F.col("n")
    mi = (
        F.log2(nd("n"))
        - F.col("sa") / F.col("n")
        - F.col("sb") / F.col("n")
        + F.col("sab") / F.col("n")
    )
    return j.select(
        ((ha - hab) / ha).cast("float").alias("theils_u"),
        mi.cast("float").alias("mutual_info"),
        F.col("n").cast("bigint").alias("n"),
    )


@query(
    "agg_bounding_ratio",
    oracle="""
SELECT event_type,
       CAST(arg_max(CAST(round(value * 100) AS BIGINT), ts)
            - arg_min(CAST(round(value * 100) AS BIGINT), ts) AS DOUBLE)
         / (CAST(epoch_us(MAX(ts)) AS DOUBLE) / 1000000
            - CAST(epoch_us(MIN(ts)) AS DOUBLE) / 1000000)
         / 100 AS bounding_ratio
FROM events GROUP BY event_type
""",
)
def agg_bounding_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH boundingRatio(ts, value): slope between the first and last point
    of each group — (value at max ts - value at min ts)/(max ts - min ts).
    Values go through exact cents and timestamps through exact
    microseconds, so the single final division sees identical operands in
    both engines (hash-exact DOUBLE)."""
    ev = t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return ev.groupBy("event_type").agg(
        (
            (F.max_by(cents, F.col("ts")) - F.min_by(cents, F.col("ts"))).cast(
                "double"
            )
            / (
                F.unix_micros(F.max("ts")).cast("double") / 1000000
                - F.unix_micros(F.min("ts")).cast("double") / 1000000
            )
            / 100
        ).alias("bounding_ratio")
    )


@query(
    "agg_spearman_corr",
    oracle="""
WITH r AS (
  SELECT event_type,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY value, event_id) AS rx,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY ts, event_id) AS ry
  FROM events
), s AS (
  SELECT event_type,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM(rx) AS DOUBLE) AS sx, CAST(SUM(ry) AS DOUBLE) AS sy,
    CAST(SUM(rx * rx) AS DOUBLE) AS sxx,
    CAST(SUM(ry * ry) AS DOUBLE) AS syy,
    CAST(SUM(rx * ry) AS DOUBLE) AS sxy
  FROM r GROUP BY event_type
)
SELECT event_type,
  (n * sxy - sx * sy)
    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS spearman_rho
FROM s
""",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between event value and event time per
    type: Pearson over ROW_NUMBER ranks with a deterministic event_id
    tiebreak (total order, so both engines assign identical integer ranks;
    all sums exact, the statistic a hash-exact DOUBLE).  Two sorts on one
    group exchange — the rank windows share the partition key."""
    ev = t(spark, sf_dir, "events")
    wx = Window.partitionBy("event_type").orderBy("value", "event_id")
    wy = Window.partitionBy("event_type").orderBy("ts", "event_id")
    r = ev.select(
        "event_type",
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").cast("double").alias("sx"),
        F.sum("ry").cast("double").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).cast("double").alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).cast("double").alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).cast("double").alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return s.select("event_type", (num / den).alias("spearman_rho"))


# --------------------------------------------------------------------------
# analysisOfVariance (CH anova): one-way F statistic between groups from
# exact integer power sums (value widened to cents); the cross-group
# reductions surface as FLOAT per the module's transcendental/accumulation
# policy (double sum order across groups is engine-internal).
# --------------------------------------------------------------------------


@query(
    "agg_anova_f",
    oracle="""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)
                  * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
  FROM events GROUP BY event_type
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn,
         CAST(SUM(s) AS DOUBLE) AS ss,
         CAST(SUM(q) AS DOUBLE) AS qq,
         SUM(CAST(s AS DOUBLE) * s / n) AS between_raw,
         COUNT(*) AS k
  FROM g
)
SELECT CAST(((between_raw - ss * ss / nn) / (k - 1))
            / ((qq - between_raw) / (nn - k)) AS FLOAT) AS f_stat,
       CAST(k - 1 AS BIGINT) AS dof_between,
       CAST(nn - k AS BIGINT) AS dof_within,
       CAST(between_raw - ss * ss / nn AS FLOAT) AS ss_between,
       CAST(qq - between_raw AS FLOAT) AS ss_within
FROM tot
""",
)
def agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of value (exact cents) across event types:
    F = (SSB/(k-1)) / (SSW/(N-k)) with SSB/SSW from exact per-group
    integer sums.  ClickHouse parity: analysisOfVariance()."""
    ev = t(spark, sf_dir, "events")
    v = F.round(F.col("value") * 100).cast("bigint")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(v).cast("bigint").alias("s"),
        F.sum(v * v).cast("bigint").alias("q"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("double").alias("ss"),
        F.sum("q").cast("double").alias("qq"),
        F.sum(F.col("s").cast("double") * F.col("s") / F.col("n")).alias(
            "between_raw"
        ),
        F.count(F.lit(1)).alias("k"),
    )
    ssb = F.col("between_raw") - F.col("ss") * F.col("ss") / F.col("nn")
    ssw = F.col("qq") - F.col("between_raw")
    return tot.select(
        ((ssb / (F.col("k") - 1)) / (ssw / (F.col("nn") - F.col("k"))))
        .cast("float")
        .alias("f_stat"),
        (F.col("k") - 1).cast("bigint").alias("dof_between"),
        (F.col("nn") - F.col("k")).cast("bigint").alias("dof_within"),
        ssb.cast("float").alias("ss_between"),
        ssw.cast("float").alias("ss_within"),
    )


# --------------------------------------------------------------------------
# cramersVBiasCorrected (CH): the Bergsma small-sample correction on the
# same contingency pipeline as agg_cramers_v.
# --------------------------------------------------------------------------


@query(
    "agg_cramers_v_bias_corrected",
    oracle="""
WITH cell AS (
  SELECT event_type AS a, user_id % 7 AS b, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, user_id % 7
), marg AS (
  SELECT a, b, o,
         SUM(o) OVER (PARTITION BY a) AS ra,
         SUM(o) OVER (PARTITION BY b) AS cb,
         SUM(o) OVER () AS n
  FROM cell
), chi AS (
  SELECT SUM((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
             * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
             / (CAST(ra AS DOUBLE) * cb / n)) AS chi2,
         MAX(n) AS n,
         COUNT(DISTINCT a) AS r, COUNT(DISTINCT b) AS c
  FROM marg
)
SELECT
  CAST(sqrt(
    GREATEST(chi2 / n - CAST((r - 1) * (c - 1) AS DOUBLE) / (n - 1), 0)
    / LEAST(r - CAST((r - 1) * (r - 1) AS DOUBLE) / (n - 1) - 1,
            c - CAST((c - 1) * (c - 1) AS DOUBLE) / (n - 1) - 1)
    ) AS FLOAT) AS cramers_v_bc,
  CAST(n AS BIGINT) AS n
FROM chi
""",
)
def agg_cramers_v_bias_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bias-corrected Cramér's V (Bergsma 2013):
    phi2~ = max(0, chi2/n - (r-1)(c-1)/(n-1)), r~ = r - (r-1)^2/(n-1),
    c~ = c - (c-1)^2/(n-1), V~ = sqrt(phi2~ / min(r~-1, c~-1)).
    ClickHouse parity: cramersVBiasCorrected()."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("a"), (F.col("user_id") % 7).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    marg = cell.select(
        "a", "b", "o",
        F.sum("o").over(Window.partitionBy("a")).alias("ra"),
        F.sum("o").over(Window.partitionBy("b")).alias("cb"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    chi = marg.agg(
        F.sum((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e)
        .alias("chi2"),
        F.max("n").alias("n"),
        F.countDistinct("a").alias("r"),
        F.countDistinct("b").alias("c"),
    )
    n, r, c = F.col("n"), F.col("r"), F.col("c")
    phi2c = F.greatest(
        F.col("chi2") / n - ((r - 1) * (c - 1)).cast("double") / (n - 1),
        F.lit(0.0),
    )
    rc = r - ((r - 1) * (r - 1)).cast("double") / (n - 1)
    cc = c - ((c - 1) * (c - 1)).cast("double") / (n - 1)
    return chi.select(
        F.sqrt(phi2c / F.least(rc - 1, cc - 1)).cast("float").alias("cramers_v_bc"),
        n.cast("bigint").alias("n"),
    )


# --------------------------------------------------------------------------
# contingency (CH contingency coefficient): sqrt(chi2 / (chi2 + n)) on the
# same contingency pipeline as Cramér's V.
# --------------------------------------------------------------------------


@query(
    "agg_contingency",
    oracle="""
WITH cell AS (
  SELECT event_type AS a, user_id % 7 AS b, CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, user_id % 7
), marg AS (
  SELECT a, b, o,
         SUM(o) OVER (PARTITION BY a) AS ra,
         SUM(o) OVER (PARTITION BY b) AS cb,
         SUM(o) OVER () AS n
  FROM cell
), chi AS (
  SELECT SUM((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
             * (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * cb / n)
             / (CAST(ra AS DOUBLE) * cb / n)) AS chi2,
         MAX(n) AS n
  FROM marg
)
SELECT CAST(sqrt(chi2 / (chi2 + n)) AS FLOAT) AS contingency,
       CAST(n AS BIGINT) AS n
FROM chi
""",
)
def agg_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson contingency coefficient C = sqrt(chi2/(chi2+n)) between
    event type and the 7-way user cohort.  ClickHouse parity:
    contingency()."""
    ev = t(spark, sf_dir, "events")
    cell = ev.groupBy(
        F.col("event_type").alias("a"), (F.col("user_id") % 7).alias("b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    marg = cell.select(
        "a", "b", "o",
        F.sum("o").over(Window.partitionBy("a")).alias("ra"),
        F.sum("o").over(Window.partitionBy("b")).alias("cb"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    e = F.col("ra").cast("double") * F.col("cb") / F.col("n")
    chi = marg.agg(
        F.sum((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e)
        .alias("chi2"),
        F.max("n").alias("n"),
    )
    return chi.select(
        F.sqrt(F.col("chi2") / (F.col("chi2") + F.col("n")))
        .cast("float")
        .alias("contingency"),
        F.col("n").cast("bigint").alias("n"),
    )


# --------------------------------------------------------------------------
# quantileTiming (ClickHouse parity): the fixed-resolution timing histogram
# — 1 ms exact below 1024 ms, 16 ms resolution from 1024 ms up, everything
# above 30 s counted as 30 s (the documented CH accuracy contract for
# request-latency quantiles).  State is the bounded histogram (<= 1024 +
# ~1810 + 1 buckets regardless of row count), which is what makes it the
# scale answer next to exact percentile: one groupBy on (key, bucket),
# then a bucket-count cumulative scan — no per-value ordered state.
# Rank rule: the q-quantile is the smallest bucket whose cumulative count
# reaches ceil(q * n) — integer-exact, both engines agree bit-for-bit.
# Reference: CH quantileTiming docs (deterministic, fixed precision bands).
# --------------------------------------------------------------------------

@query(
    "agg_quantile_timing",
    oracle="""
WITH ms AS (
  SELECT event_type,
         CAST(FLOOR(value * 97) AS BIGINT) AS ms
  FROM events
),
bucketed AS (
  SELECT event_type,
         CASE WHEN ms >= 30000 THEN 30000
              WHEN ms < 1024 THEN ms
              ELSE (ms // 16) * 16 END AS b
  FROM ms
),
hist AS (
  SELECT event_type, b, COUNT(*) AS cnt
  FROM bucketed GROUP BY event_type, b
),
cum AS (
  SELECT event_type, b, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) AS c,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       CAST(MIN(CASE WHEN c >= CEIL(0.5 * n) THEN b END) AS BIGINT) AS q50_ms,
       CAST(MIN(CASE WHEN c >= CEIL(0.9 * n) THEN b END) AS BIGINT) AS q90_ms,
       CAST(MIN(CASE WHEN c >= CEIL(0.99 * n) THEN b END) AS BIGINT) AS q99_ms
FROM cum GROUP BY event_type
""",
)
def agg_quantile_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 latency per event type under quantileTiming's histogram
    contract (value*97 ms synthesizes a latency column that crosses both
    the 1024 ms resolution break and the 30 s clamp)."""
    ev = t(spark, sf_dir, "events")
    ms = F.floor(F.col("value") * 97).cast("bigint")
    b = (
        F.when(ms >= 30000, F.lit(30000))
        .when(ms < 1024, ms)
        .otherwise(F.expr("(CAST(FLOOR(value * 97) AS BIGINT) DIV 16) * 16"))
    )
    hist = ev.groupBy("event_type", b.alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cum = hist.select(
        "event_type", "b", "cnt",
        F.sum("cnt").over(
            Window.partitionBy("event_type").orderBy("b")
        ).alias("c"),
        F.sum("cnt").over(Window.partitionBy("event_type")).alias("n"),
    )

    def q_at(q: float, name: str):
        return F.min(
            F.when(F.col("c") >= F.ceil(F.lit(q) * F.col("n")), F.col("b"))
        ).cast("bigint").alias(name)

    return cum.groupBy("event_type").agg(
        q_at(0.5, "q50_ms"), q_at(0.9, "q90_ms"), q_at(0.99, "q99_ms")
    )


# --------------------------------------------------------------------------
# OHLC time-series resampling (open/high/low/close per bucket) — the
# financial-candle shape, but equally the standard "first/last/extremes per
# window" rollup for any metric stream.  Open/close come from ONE window
# pass (row_number asc over the (ts, event_id) total order; the desc rank
# shares the same sort via count-over-partition minus rank), then a single
# conditional groupBy.  Values in exact cents so H/L hash bit-for-bit.
# --------------------------------------------------------------------------

@query(
    "ts_ohlc_daily",
    oracle="""
WITH pts AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type, date_trunc('day', ts)
           ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (
           PARTITION BY event_type, date_trunc('day', ts)) AS cnt
  FROM events
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(MAX(CASE WHEN rn = 1 THEN cents END) AS BIGINT) AS open_c,
       CAST(MAX(cents) AS BIGINT) AS high_c,
       CAST(MIN(cents) AS BIGINT) AS low_c,
       CAST(MAX(CASE WHEN rn = cnt THEN cents END) AS BIGINT) AS close_c,
       CAST(COUNT(*) AS BIGINT) AS n_ticks
FROM pts GROUP BY event_type, day
""",
)
def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) OHLC candles over the value stream (cents-
    exact; open/close tie-broken by the (ts, event_id) total order)."""
    ev = t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("bigint")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    w = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    pts = ev.select(
        "event_type", day.alias("day"), cents.alias("cents"), "ts", "event_id"
    ).select(
        "event_type", "day", "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_type", "day")
        ).alias("cnt"),
    )
    return pts.groupBy("event_type", "day").agg(
        F.max(F.when(F.col("rn") == 1, F.col("cents"))).cast("bigint")
        .alias("open_c"),
        F.max("cents").cast("bigint").alias("high_c"),
        F.min("cents").cast("bigint").alias("low_c"),
        F.max(F.when(F.col("rn") == F.col("cnt"), F.col("cents")))
        .cast("bigint").alias("close_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_ticks"),
    )


# quantileTimingWeighted: same fixed-resolution histogram, each value
# carrying an integer weight (e.g. request count per pre-aggregated row) —
# cumulative WEIGHT replaces cumulative count in the rank rule.

@query(
    "agg_quantile_timing_weighted",
    oracle="""
WITH ms AS (
  SELECT event_type,
         CAST(FLOOR(value * 97) AS BIGINT) AS ms,
         CAST(user_id % 5 + 1 AS BIGINT) AS w
  FROM events
),
bucketed AS (
  SELECT event_type, w,
         CASE WHEN ms >= 30000 THEN 30000
              WHEN ms < 1024 THEN ms
              ELSE (ms // 16) * 16 END AS b
  FROM ms
),
hist AS (
  SELECT event_type, b, SUM(w) AS wt
  FROM bucketed GROUP BY event_type, b
),
cum AS (
  SELECT event_type, b,
         SUM(wt) OVER (PARTITION BY event_type ORDER BY b) AS c,
         SUM(wt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       CAST(MIN(CASE WHEN c >= CEIL(0.5 * n) THEN b END) AS BIGINT) AS q50_ms,
       CAST(MIN(CASE WHEN c >= CEIL(0.9 * n) THEN b END) AS BIGINT) AS q90_ms,
       CAST(MIN(CASE WHEN c >= CEIL(0.99 * n) THEN b END) AS BIGINT) AS q99_ms
FROM cum GROUP BY event_type
""",
)
def agg_quantile_timing_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quantileTimingWeighted: weighted p50/p90/p99 under the same
    histogram contract (weight = user_id%5+1, standing in for a
    pre-aggregated request count)."""
    ev = t(spark, sf_dir, "events")
    ms = F.floor(F.col("value") * 97).cast("bigint")
    b = (
        F.when(ms >= 30000, F.lit(30000))
        .when(ms < 1024, ms)
        .otherwise(F.expr("(CAST(FLOOR(value * 97) AS BIGINT) DIV 16) * 16"))
    )
    w = (F.col("user_id") % 5 + 1).cast("bigint")
    hist = ev.groupBy("event_type", b.alias("b")).agg(
        F.sum(w).alias("wt")
    )
    cum = hist.select(
        "event_type", "b",
        F.sum("wt").over(
            Window.partitionBy("event_type").orderBy("b")
        ).alias("c"),
        F.sum("wt").over(Window.partitionBy("event_type")).alias("n"),
    )

    def q_at(q: float, name: str):
        return F.min(
            F.when(F.col("c") >= F.ceil(F.lit(q) * F.col("n")), F.col("b"))
        ).cast("bigint").alias(name)

    return cum.groupBy("event_type").agg(
        q_at(0.5, "q50_ms"), q_at(0.9, "q90_ms"), q_at(0.99, "q99_ms")
    )


_DELTA_SWEEP_SQL = """
WITH src AS (
  SELECT event_type, ts, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
         CAST(user_id % 997 AS BIGINT) AS s,
         CAST(user_id % 997 + event_id % 50 + 1 AS BIGINT) AS e
  FROM events
),
d AS (
  SELECT event_type,
         greatest(v - lag(v) OVER (PARTITION BY event_type
                                   ORDER BY ts, event_id), 0) AS dv
  FROM src
),
ds AS (
  SELECT event_type, CAST(SUM(dv) AS BIGINT) AS delta_sum
  FROM d GROUP BY event_type
),
pts AS (
  SELECT event_type, s AS pos, 1 AS delta FROM src
  UNION ALL
  SELECT event_type, e AS pos, -1 AS delta FROM src
),
run AS (
  SELECT event_type, pos,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY pos, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running
  FROM pts
),
mx AS (
  SELECT event_type, CAST(MAX(running) AS BIGINT) AS max_i
  FROM run GROUP BY event_type
),
mip AS (
  SELECT r.event_type, CAST(MIN(r.pos) AS BIGINT) AS max_pos
  FROM run r JOIN mx ON r.event_type = mx.event_type
                     AND r.running = mx.max_i
  GROUP BY r.event_type
)
SELECT ds.event_type, ds.delta_sum, mx.max_i, mip.max_pos
FROM ds
JOIN mx ON ds.event_type = mx.event_type
JOIN mip ON ds.event_type = mip.event_type
"""


@query("agg_delta_max_intersections", oracle=_DELTA_SWEEP_SQL)
def agg_delta_max_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH order-dependent aggregates deltaSum, maxIntersections and
    maxIntersectionsPosition, re-expressed as window algebra instead of
    streaming state: deltaSum = sum of positive consecutive deltas under a
    TOTAL order (ts, event_id — CH's result depends on read order; pinning
    the order makes it deterministic and oracle-replayable); the
    intersection pair = a boundary sweep (start:+1, end:-1, ends sorted
    before starts at equal positions — CH's half-open convention), running
    prefix sums per type, then MAX and the first position attaining it
    (both invariant under tie reordering: within an equal-(pos,delta)
    group the extremum sits at the group edge).  Scale shape: two
    shuffles (one per window partition key) + a broadcast-sized join on
    event_type; state never exceeds the group's rows, and the same SQL
    text runs on both engines."""
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    return spark.sql(_DELTA_SWEEP_SQL)
