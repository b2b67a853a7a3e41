"""Round-7 warehouse-analytics classics: SCD2 interval build, cohort
retention matrix, last-touch attribution, market-basket lift, Gini
concentration, Markov transition matrix.

Reference parity: these are the standard analyst recipes the reference's
users run through its raw-SQL OlapTable passthrough and Query builder
(SURVEY.md §2.2/§2.4 — the reference executes arbitrary ClickHouse SQL;
packages/py-moose-lib/.../olap_table.py `query`); each is re-expressed
as a first-class deterministic DataFrame operator with a hard oracle.

Determinism discipline (operators/aggregates_stats.py header): money is
exact cents BIGINTs; ratios are either ppm-scaled integer floor
divisions or a single fixed FP expression tree over exact integer
operands — never an order-dependent float aggregate.

Scale shapes (100 TB):
- SCD2 / Markov / attribution: one window pass partitioned BY USER over
  (ts, event_id) — the per-user total order; shuffle once on user_id,
  no range join, carried state is O(1) per row.
- Cohort: two groupBys (per-user cohort, then matrix cell) + one
  broadcast-size join of per-user cohorts back onto activity — the
  cohort table is |users|, the matrix is |weeks|^2.
- Basket: DISTINCT (order, part) projection, then a within-order
  self-join — pair expansion bounded by basket size squared, never by
  corpus size; support filter prunes before the lift arithmetic.
- Gini: ranks need a global order; here the window runs over the
  per-customer AGGREGATE (customer-bounded, not row-bounded).  For
  billion-customer corpora replace the single-partition window with a
  range-partitioned sort + per-partition offset pass (documented
  boundary; the aggregate stays the only shuffled payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

_CENTS = "CAST(round(value * 100) AS BIGINT)"


@query(
    "table_scd2_build",
    oracle=f"""
SELECT user_id, {_CENTS} AS cents,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                '%Y-%m-%d %H:%M:%S') AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM events
""",
)
def table_scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from the events change
    log: each user's value history becomes [valid_from, valid_to) rows
    with the open row flagged current.  One window pass per user on the
    (ts, event_id) total order."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        F.expr(_CENTS).alias("cents"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "cohort_retention_matrix",
    oracle="""
WITH cohorts AS (
  SELECT user_id,
         CAST(datediff('day', DATE '2024-01-01', MIN(CAST(ts AS DATE))) // 7
           AS BIGINT) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
           AS BIGINT) AS act_week
  FROM events
)
SELECT c.cohort_week, a.act_week - c.cohort_week AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM cohorts c JOIN activity a USING (user_id)
WHERE a.act_week >= c.cohort_week
GROUP BY c.cohort_week, week_offset
""",
)
def cohort_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup-cohort x week-offset distinct-active-user matrix — the
    generalization of retention_weekly to every cohort at once.  Week
    indexes are exact integer day-diffs floor-divided by 7 (day index is
    never negative, so Spark's truncating div agrees with floor)."""
    e = t(spark, sf_dir, "events")
    week = (F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")) / 7).cast(
        "int"
    )  # day index >= 0: truncation == floor
    cohorts = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).cast("bigint").alias("cohort_week"))
    )
    activity = e.select("user_id", week.cast("bigint").alias("act_week")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week", (F.col("act_week") - F.col("cohort_week")).alias("week_offset")
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


@query(
    "attribution_last_touch",
    oracle=f"""
WITH tagged AS (
  SELECT event_type, {_CENTS} AS cents,
         LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch
  FROM events
)
SELECT COALESCE(last_touch, 'none') AS channel,
       CAST(COUNT(*) AS BIGINT) AS conversions,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM tagged WHERE event_type = 'purchase'
GROUP BY COALESCE(last_touch, 'none')
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the most
    recent STRICTLY-PRIOR view/click (frame ends at 1 PRECEDING, so a
    same-instant touch can't claim its own purchase); purchases with no
    prior touch land in 'none'.  Single per-user window pass — no range
    join, O(1) carried state."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type").isin("view", "click"), F.col("event_type")
    )
    tagged = e.select(
        "event_type",
        F.expr(_CENTS).alias("cents"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    return (
        tagged.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("last_touch", F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("conversions"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


@query(
    "basket_pair_lift",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
), supp AS (
  SELECT l_partkey, COUNT(*) AS cnt FROM op GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS pair_cnt
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 2
)
SELECT p.p1, p.p2, CAST(p.pair_cnt AS BIGINT) AS pair_cnt,
       CAST((p.pair_cnt * n.n_orders * 1000000) // (s1.cnt * s2.cnt)
         AS BIGINT) AS lift_ppm
FROM pairs p, n
JOIN supp s1 ON p.p1 = s1.l_partkey
JOIN supp s2 ON p.p2 = s2.l_partkey
""",
)
def basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining over lineitem: support >= 2 part pairs
    co-occurring in an order, with lift as a ppm-scaled exact integer
    ((pair * n_orders * 1e6) div (cnt1 * cnt2) — all operands positive,
    so div == floor).  Pair expansion is the within-order self-join —
    bounded by basket size squared, not corpus size."""
    li = t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint()
    n_orders = op.select("l_orderkey").distinct().count()
    supp = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    a = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p1"))
    b = op.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, ["ok"])
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .filter(F.col("pair_cnt") >= 2)
    )
    s1 = supp.select(F.col("l_partkey").alias("p1"), F.col("cnt").alias("cnt1"))
    s2 = supp.select(F.col("l_partkey").alias("p2"), F.col("cnt").alias("cnt2"))
    return (
        pairs.join(s1, "p1")
        .join(s2, "p2")
        .select(
            "p1",
            "p2",
            F.col("pair_cnt").cast("bigint").alias("pair_cnt"),
            F.expr(
                f"(pair_cnt * {n_orders}L * 1000000L) div (cnt1 * cnt2)"
            ).alias("lift_ppm"),
        )
    )


@query(
    "agg_gini_revenue",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rnk,
         COUNT(*) OVER () AS n
  FROM cust
)
SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(rnk * cents) AS BIGINT) AS weighted_sum,
       2.0 * CAST(SUM(rnk * cents) AS DOUBLE)
         / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE))
         - (CAST(MAX(n) AS DOUBLE) + 1.0) / CAST(MAX(n) AS DOUBLE) AS gini
FROM ranked
""",
)
def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue via the sorted-rank
    identity G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n.  Rank/sum/weighted
    sum are exact BIGINTs ((cents, custkey) total order breaks ties);
    gini is ONE fixed FP expression tree over those exact integers —
    hash-deterministic.  weighted_sum <= n * total (~2e14 at sf0.1),
    far inside int64 through sf~300."""
    o = t(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("cents", "o_custkey")
    ranked = cust.select(
        "cents",
        F.row_number().over(w).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(F.col("rnk") * F.col("cents")).cast("bigint").alias("weighted_sum"),
        (
            F.lit(2.0) * F.sum(F.col("rnk") * F.col("cents")).cast("double")
            / (F.max("n").cast("double") * F.sum("cents").cast("double"))
            - (F.max("n").cast("double") + F.lit(1.0)) / F.max("n").cast("double")
        ).alias("gini"),
    )


@query(
    "agg_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type
  FROM events
), cnts AS (
  SELECT from_type, to_type, COUNT(*) AS cnt
  FROM seq WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, CAST(cnt AS BIGINT) AS cnt,
       CAST((cnt * 1000000) // SUM(cnt) OVER (PARTITION BY from_type)
         AS BIGINT) AS p_ppm
FROM cnts
""",
)
def agg_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event sequences:
    counts plus ppm-scaled conditional probabilities (integer floor
    division — positive operands).  One per-user lag window + one
    groupBy; the matrix is |event_types|^2."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    cnts = (
        seq.filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wf = Window.partitionBy("from_type")
    return (
        cnts.withColumn("tot", F.sum("cnt").over(wf))
        .select(
            "from_type",
            "to_type",
            F.col("cnt").cast("bigint").alias("cnt"),
            # integer div, positive operands: matches the oracle's floor //
            F.expr("(cnt * 1000000L) div tot").cast("bigint").alias("p_ppm"),
        )
    )


@query(
    "cohort_churn_weekly",
    oracle="""
WITH aw AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7
           AS BIGINT) AS w
  FROM events
), nxt AS (
  SELECT a.user_id, a.w,
         CASE WHEN b.user_id IS NULL THEN 1 ELSE 0 END AS churned
  FROM aw a LEFT JOIN aw b
    ON a.user_id = b.user_id AND b.w = a.w + 1
), last_w AS (
  SELECT MAX(w) AS mw FROM aw
)
SELECT w, CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(SUM(churned) AS BIGINT) AS churned_users,
       CAST((SUM(churned) * 1000000) // COUNT(*) AS BIGINT) AS churn_ppm
FROM nxt WHERE w < (SELECT mw FROM last_w)
GROUP BY w
""",
)
def cohort_churn_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: fraction of week-w actives with NO activity in week
    w+1 (last week excluded — its successor is unobserved).  One distinct
    projection + one self anti-probe on (user, week+1) + one groupBy;
    churn as a ppm-scaled integer (positive operands, div == floor)."""
    e = t(spark, sf_dir, "events")
    week = (F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")) / 7).cast(
        "int"
    ).cast("bigint")
    aw = e.select("user_id", week.alias("w")).distinct().localCheckpoint()
    nxt = aw.select(F.col("user_id").alias("nu"), (F.col("w") - 1).alias("nw"))
    probed = aw.join(
        nxt, (aw.user_id == nxt.nu) & (aw.w == nxt.nw), "left"
    ).select("user_id", "w", F.when(F.col("nu").isNull(), 1).otherwise(0).alias("churned"))
    last_w = aw.agg(F.max("w").alias("mw"))
    return (
        probed.crossJoin(F.broadcast(last_w))
        .filter(F.col("w") < F.col("mw"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum("churned").cast("bigint").alias("churned_users"),
            F.expr("(sum(churned) * 1000000) div count(*)")
            .cast("bigint")
            .alias("churn_ppm"),
        )
    )


@query(
    "attribution_linear",
    oracle=f"""
WITH tagged AS (
  SELECT event_type, {_CENTS} AS cents,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hv,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hc
  FROM events
), conv AS (
  SELECT cents, COALESCE(hv, 0) AS hv, COALESCE(hc, 0) AS hc
  FROM tagged WHERE event_type = 'purchase'
)
SELECT channel,
       CAST(SUM(micros) AS BIGINT) AS credit_micros,
       CAST(COUNT(*) AS BIGINT) AS touches
FROM (
  SELECT 'view' AS channel, (cents * 1000000) // (hv + hc) AS micros
  FROM conv WHERE hv = 1
  UNION ALL
  SELECT 'click', (cents * 1000000) // (hv + hc) FROM conv WHERE hc = 1
  UNION ALL
  SELECT 'none', cents * 1000000 FROM conv WHERE hv = 0 AND hc = 0
) GROUP BY channel
""",
)
def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) attribution: each purchase's cents split
    evenly across the channels (view/click) touched strictly before it;
    shares are micro-cent integers (cents*1e6 div n_channels — positive
    operands, div == floor) so the per-channel credit sums are exact
    BIGINTs.  Untouched purchases credit 'none' whole.  Same single
    per-user window pass as last-touch."""
    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flag = lambda et: F.coalesce(  # noqa: E731
        F.max(F.when(F.col("event_type") == et, 1).otherwise(0)).over(w),
        F.lit(0),
    )
    conv = e.select(
        "event_type",
        F.expr(_CENTS).alias("cents"),
        flag("view").alias("hv"),
        flag("click").alias("hc"),
    ).filter(F.col("event_type") == "purchase")
    n = F.col("hv") + F.col("hc")
    share = F.expr("(cents * 1000000L) div (hv + hc)")
    v = conv.filter(F.col("hv") == 1).select(
        F.lit("view").alias("channel"), share.alias("micros")
    )
    c = conv.filter(F.col("hc") == 1).select(
        F.lit("click").alias("channel"), share.alias("micros")
    )
    z = conv.filter((F.col("hv") == 0) & (F.col("hc") == 0)).select(
        F.lit("none").alias("channel"),
        F.expr("cents * 1000000L").alias("micros"),
    )
    return (
        v.unionByName(c)
        .unionByName(z)
        .groupBy("channel")
        .agg(
            F.sum("micros").cast("bigint").alias("credit_micros"),
            F.count(F.lit(1)).cast("bigint").alias("touches"),
        )
    )
