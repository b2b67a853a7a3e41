"""Round-7 statistical-test aggregates: studentTTest, meanZTest,
kruskalWallis, categoricalInformationValue, sequenceNextNode, and the
ntile/percent_rank/cume_dist window trio.

ClickHouse parity (the reference exposes the full CH aggregate surface
through its OlapTable SQL passthrough; SURVEY.md §2.4 / §2.9):

- ``studentTTest(x, y)``: pooled-variance two-sample t — companion to the
  existing ``agg_welch_ttest`` (unequal-variance form);
- ``meanZTest(var_x, var_y, conf)(x, y)``: z statistic with the population
  variances supplied; here the exact population variances of the two
  samples are computed in the same plan and fed to the identical formula;
- ``kruskalWallisTest-shaped`` rank test: the K-group generalization of
  Mann-Whitney (CH ships mannWhitneyUTest / rankCorr; the K-group H
  statistic reuses the same distinct-value-histogram rank scaffold —
  operators/aggregates_stats.py:443 — so the only ordered pass is
  distinct-value-sized, never a global sort of the raw sample);
- ``categoricalInformationValue(cat)(label)``: per-category weight of
  evidence + information-value term;
- ``sequenceNextNode('forward','first_match')(ts, event, cond...)``: the
  event that FOLLOWS the first matched chain per key, re-expressed as
  window algebra (lead chain + first-match row_number) instead of CH's
  in-memory per-key event list;
- ``ntile / percent_rank / cume_dist``: the remaining rank-family window
  functions not yet gated (windows.py covers rank/dense_rank/row_number/
  nth_value/lag/lead).

Float determinism (house discipline, see aggregates_stats.py header):
every sum is over exact integers or exact half-integer ranks (order-
independent); the final statistics evaluate an identical arithmetic tree
over identical doubles in both engines, so even DOUBLE outputs
hash-match.  The one log() (WOE) is cast to FLOAT — the sanctioned
precision reduction for libm-vs-JVM last-ulp divergence.

Scale: every gate is one or two map-side-combinable groupBys plus (for
the rank tests) a distinct-value-sized ordered pass; sequence_next_node
is a single per-user window (one shuffle on user_id).  No driver
collects, no crossJoins, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# studentTTest (CH aggregate-functions): pooled-variance two-sample t.
# Same cents-exact power-sum scaffold as agg_welch_ttest; the pooled
# variance ((q1 - a1^2/n1) + (q2 - a2^2/n2)) / (n1 + n2 - 2) uses the
# exact corrected sums of squares, so t and df are hash-exact.
# --------------------------------------------------------------------------


@query(
    "agg_student_ttest",
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
    / sqrt(((q1 - a1 * a1 / n1) + (q2 - a2 * a2 / n2)) / (n1 + n2 - 2)
           * (1.0 / n1 + 1.0 / n2)) AS t_stat,
  n1 + n2 - 2 AS student_df,
  ((q1 - a1 * a1 / n1) + (q2 - a2 * a2 / n2)) / (n1 + n2 - 2)
    AS pooled_var_cents2,
  CAST(n1 AS BIGINT) AS n_purchase,
  CAST(n2 AS BIGINT) AS n_click
FROM w
""",
)
def agg_student_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``studentTTest``: pooled-variance t between purchase and click
    event values (cents-exact power sums; hash-exact DOUBLE statistic)."""
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
    css1 = F.col("q1") - F.col("a1") * F.col("a1") / F.col("n1")
    css2 = F.col("q2") - F.col("a2") * F.col("a2") / F.col("n2")
    pooled = (css1 + css2) / (F.col("n1") + F.col("n2") - 2)
    tstat = (F.col("a1") / F.col("n1") - F.col("a2") / F.col("n2")) / F.sqrt(
        pooled * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return w.select(
        tstat.alias("t_stat"),
        (F.col("n1") + F.col("n2") - 2).alias("student_df"),
        pooled.alias("pooled_var_cents2"),
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
    )


# --------------------------------------------------------------------------
# meanZTest (CH aggregate-functions): z = (m1 - m2) /
# sqrt(var1/n1 + var2/n2) with the POPULATION variances supplied as
# parameters.  Here the exact population variances of the two samples
# are computed in the same plan (q/n - (a/n)^2 over exact cents power
# sums) and fed to the identical formula — the parametric contract with
# in-plan parameters.
# --------------------------------------------------------------------------


@query(
    "agg_mean_z_test",
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
    / sqrt((q1 / n1 - (a1 / n1) * (a1 / n1)) / n1
           + (q2 / n2 - (a2 / n2) * (a2 / n2)) / n2) AS z_stat,
  q1 / n1 - (a1 / n1) * (a1 / n1) AS pop_var_purchase,
  q2 / n2 - (a2 / n2) * (a2 / n2) AS pop_var_click,
  CAST(n1 AS BIGINT) AS n_purchase,
  CAST(n2 AS BIGINT) AS n_click
FROM w
""",
)
def agg_mean_z_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``meanZTest``: two-sample z with exact in-plan population
    variances (cents scale)."""
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
    m1 = F.col("a1") / F.col("n1")
    m2 = F.col("a2") / F.col("n2")
    v1 = F.col("q1") / F.col("n1") - m1 * m1
    v2 = F.col("q2") / F.col("n2") - m2 * m2
    z = (m1 - m2) / F.sqrt(v1 / F.col("n1") + v2 / F.col("n2"))
    return w.select(
        z.alias("z_stat"),
        v1.alias("pop_var_purchase"),
        v2.alias("pop_var_click"),
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
    )


# --------------------------------------------------------------------------
# Kruskal-Wallis H (K-group rank test; the K-group generalization of CH
# mannWhitneyUTest).  Distinct-value-histogram ranks (cents), so the
# ordered pass is distinct-value-sized.  Rank sums R_g are sums of
# cnt * half-integer-rank products — exact in double at any SF that fits
# 2^52 half-units (sf100 inclusive) — and the three groups pivot into
# scalar columns so the final H / tie-correction expression is a FIXED
# arithmetic tree (no order-dependent double reduction).
# --------------------------------------------------------------------------


@query(
    "agg_kruskal_wallis",
    oracle="""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2,
         CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS c3,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events WHERE event_type IN ('purchase', 'click', 'view')
  GROUP BY CAST(round(value * 100) AS BIGINT)
), r AS (
  SELECT c1, c2, c3, nt,
         (COALESCE(SUM(nt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + CAST(nt + 1 AS DOUBLE) / 2) AS avg_rank
  FROM h
), s AS (
  SELECT
    CAST(SUM(c1) AS DOUBLE) AS n1,
    CAST(SUM(c2) AS DOUBLE) AS n2,
    CAST(SUM(c3) AS DOUBLE) AS n3,
    CAST(SUM(nt) AS DOUBLE) AS n,
    SUM(c1 * avg_rank) AS r1,
    SUM(c2 * avg_rank) AS r2,
    SUM(c3 * avg_rank) AS r3,
    CAST(SUM(nt * nt * nt - nt) AS DOUBLE) AS ties
  FROM r
)
SELECT
  12 / (n * (n + 1)) * (r1 * r1 / n1 + r2 * r2 / n2 + r3 * r3 / n3)
    - 3 * (n + 1) AS h_stat,
  (12 / (n * (n + 1)) * (r1 * r1 / n1 + r2 * r2 / n2 + r3 * r3 / n3)
    - 3 * (n + 1)) / (1 - ties / (n * n * n - n)) AS h_corrected,
  CAST(n AS BIGINT) AS n_total,
  CAST(n1 AS BIGINT) AS n_purchase,
  CAST(n2 AS BIGINT) AS n_click,
  CAST(n3 AS BIGINT) AS n_view
FROM s
""",
)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across purchase/click/view value distributions
    (cents-quantized, tie-corrected), via the distinct-value-histogram
    rank scaffold."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    grp = F.col("event_type")
    h = ev.groupBy(cents.alias("v")).agg(
        F.sum(F.when(grp == "purchase", 1).otherwise(0)).cast("bigint").alias("c1"),
        F.sum(F.when(grp == "click", 1).otherwise(0)).cast("bigint").alias("c2"),
        F.sum(F.when(grp == "view", 1).otherwise(0)).cast("bigint").alias("c3"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = h.withColumn(
        "avg_rank",
        F.coalesce(F.sum("nt").over(w_below), F.lit(0))
        + (F.col("nt") + 1).cast("double") / 2,
    )
    s = r.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.sum("c3").cast("double").alias("n3"),
        F.sum("nt").cast("double").alias("n"),
        F.sum(F.col("c1") * F.col("avg_rank")).alias("r1"),
        F.sum(F.col("c2") * F.col("avg_rank")).alias("r2"),
        F.sum(F.col("c3") * F.col("avg_rank")).alias("r3"),
        F.sum(F.col("nt") * F.col("nt") * F.col("nt") - F.col("nt"))
        .cast("double")
        .alias("ties"),
    )
    n = F.col("n")
    hstat = (
        F.lit(12) / (n * (n + 1))
        * (
            F.col("r1") * F.col("r1") / F.col("n1")
            + F.col("r2") * F.col("r2") / F.col("n2")
            + F.col("r3") * F.col("r3") / F.col("n3")
        )
        - 3 * (n + 1)
    )
    corrected = hstat / (F.lit(1) - F.col("ties") / (n * n * n - n))
    return s.select(
        hstat.alias("h_stat"),
        corrected.alias("h_corrected"),
        n.cast("bigint").alias("n_total"),
        F.col("n1").cast("bigint").alias("n_purchase"),
        F.col("n2").cast("bigint").alias("n_click"),
        F.col("n3").cast("bigint").alias("n_view"),
    )


# --------------------------------------------------------------------------
# categoricalInformationValue (CH aggregate-functions): per-category
# weight of evidence WOE = ln((good_c/good)/(bad_c/bad)) and the IV term
# (good_c/good - bad_c/bad) * WOE.  Counts are exact; the two log-bearing
# outputs are cast to FLOAT (the sanctioned precision reduction for
# libm-vs-JVM last-ulp divergence — aggregates_stats.py header).
# --------------------------------------------------------------------------


@query(
    "agg_categorical_iv",
    oracle="""
WITH c AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN value >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS g,
         CAST(SUM(CASE WHEN value >= 50 THEN 0 ELSE 1 END) AS BIGINT) AS b
  FROM events
  GROUP BY event_type
), tot AS (
  SELECT SUM(g) AS gt, SUM(b) AS bt FROM c
)
SELECT event_type,
       g AS n_good,
       b AS n_bad,
       CAST(ln((CAST(g AS DOUBLE) / gt) / (CAST(b AS DOUBLE) / bt))
            AS FLOAT) AS woe,
       CAST((CAST(g AS DOUBLE) / gt - CAST(b AS DOUBLE) / bt)
            * ln((CAST(g AS DOUBLE) / gt) / (CAST(b AS DOUBLE) / bt))
            AS FLOAT) AS iv_term
FROM c, tot
""",
)
def agg_categorical_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``categoricalInformationValue``: WOE + IV term per event_type
    with label = (value >= 50)."""
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.sum(F.when(F.col("value") >= 50, 1).otherwise(0))
        .cast("bigint")
        .alias("g"),
        F.sum(F.when(F.col("value") >= 50, 0).otherwise(1))
        .cast("bigint")
        .alias("b"),
    )
    tot = c.agg(
        F.sum("g").alias("gt"), F.sum("b").alias("bt")
    )
    j = c.crossJoin(F.broadcast(tot))
    pg = F.col("g").cast("double") / F.col("gt")
    pb = F.col("b").cast("double") / F.col("bt")
    woe = F.log(pg / pb)
    return j.select(
        "event_type",
        F.col("g").alias("n_good"),
        F.col("b").alias("n_bad"),
        woe.cast("float").alias("woe"),
        ((pg - pb) * woe).cast("float").alias("iv_term"),
    )


# --------------------------------------------------------------------------
# sequenceNextNode (CH aggregate-functions, 'forward'/'first_match'):
# the event FOLLOWING the first view->click chain per user, as window
# algebra — one per-user ordered window (lead chain + row_number on
# match positions), then a count per next-node.  (ts, event_id) is a
# total order, so first_match is deterministic.
# --------------------------------------------------------------------------


@query(
    "agg_sequence_next_node",
    oracle="""
WITH o AS (
  SELECT user_id, event_type, ts, event_id,
         LEAD(event_type, 1) OVER w AS e1,
         LEAD(event_type, 2) OVER w AS next_node
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), m AS (
  SELECT user_id, next_node,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS match_rn
  FROM o WHERE event_type = 'view' AND e1 = 'click'
)
SELECT next_node, CAST(COUNT(*) AS BIGINT) AS n_users
FROM m
WHERE match_rn = 1 AND next_node IS NOT NULL
GROUP BY next_node
""",
)
def agg_sequence_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``sequenceNextNode('forward','first_match')``: distribution of
    the event following each user's first view->click chain."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lead("event_type", 1).over(w).alias("e1"),
        F.lead("event_type", 2).over(w).alias("next_node"),
    )
    m = (
        o.filter((F.col("event_type") == "view") & (F.col("e1") == "click"))
        .withColumn(
            "match_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy("ts", "event_id")
            ),
        )
        .filter((F.col("match_rn") == 1) & F.col("next_node").isNotNull())
    )
    return m.groupBy("next_node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# --------------------------------------------------------------------------
# ntile / percent_rank / cume_dist (the remaining rank-family window
# functions; CH exposes them through its window-function surface).
# (acctbal cents, custkey) is a total order, so all three are
# tie-free-deterministic; percent_rank and cume_dist are ratios of
# exact integers — hash-exact doubles.
# --------------------------------------------------------------------------


@query(
    "window_ntile_cume",
    oracle="""
SELECT c_custkey,
       NTILE(4) OVER w AS quartile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
)
WINDOW w AS (ORDER BY bal_cents, c_custkey)
""",
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) + percent_rank + cume_dist over customers by account
    balance (cents, custkey tiebreak — total order)."""
    cust = t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    w = Window.orderBy("bal_cents", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "agg_proportions_ztest",
    oracle="""
WITH f AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) % 2 = 0 AS succ
  FROM events WHERE event_type IN ('view', 'click')
), c AS (
  SELECT
    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(SUM(CASE WHEN event_type = 'view' AND succ THEN 1 ELSE 0 END)
         AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN event_type = 'click' AND succ THEN 1 ELSE 0 END)
         AS BIGINT) AS s2
  FROM f
)
SELECT n1, n2, s1, s2,
       (CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
         / SQRT((CAST(s1 + s2 AS DOUBLE) / (n1 + n2))
                * (1.0 - CAST(s1 + s2 AS DOUBLE) / (n1 + n2))
                * (1.0 / n1 + 1.0 / n2)) AS z
FROM c
""",
)
def agg_proportions_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH proportionsZTest shape: pooled two-proportion z statistic between
    the view and click cohorts (success := even integer cents — a
    deterministic, non-degenerate split).  All counts are exact bigints in
    ONE aggregate (no joins, no scalar crosses); the z value is the same
    correctly-rounded +,-,*,/,sqrt chain in both engines."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    succ = (F.round(F.col("value") * 100).cast("bigint") % 2 == 0)
    is_v = F.col("event_type") == "view"
    c = e.agg(
        F.sum(F.when(is_v, 1).otherwise(0)).cast("bigint").alias("n1"),
        F.sum(F.when(~is_v, 1).otherwise(0)).cast("bigint").alias("n2"),
        F.sum(F.when(is_v & succ, 1).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when((~is_v) & succ, 1).otherwise(0))
        .cast("bigint")
        .alias("s2"),
    )
    pp = (F.col("s1") + F.col("s2")).cast("double") / (
        F.col("n1") + F.col("n2")
    )
    z = (
        F.col("s1").cast("double") / F.col("n1")
        - F.col("s2").cast("double") / F.col("n2")
    ) / F.sqrt(
        pp * (F.lit(1.0) - pp)
        * (F.lit(1.0) / F.col("n1") + F.lit(1.0) / F.col("n2"))
    )
    return c.select("n1", "n2", "s1", "s2", z.alias("z"))


# --------------------------------------------------------------------------
# mannWhitneyUTest (CH aggregate-functions): the 2-sample rank test the
# K-group Kruskal-Wallis gate generalizes — same distinct-value-histogram
# rank scaffold (the only ordered pass is distinct-value-sized), exact
# half-integer ranks, tie-corrected normal approximation.  Emits both U
# statistics and the z score (sqrt is IEEE-correctly-rounded, so the
# DOUBLE output hash-matches); the p-value needs erfc, which the two
# engines disagree on past the sanctioned FLOAT cast, so the gate stops
# at z — the caller applies their preferred tail function.
# --------------------------------------------------------------------------


@query(
    "agg_mann_whitney_utest",
    oracle="""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2,
         CAST(COUNT(*) AS BIGINT) AS nt
  FROM events WHERE event_type IN ('purchase', 'click')
  GROUP BY CAST(round(value * 100) AS BIGINT)
), r AS (
  SELECT c1, c2, nt,
         (COALESCE(SUM(nt) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + CAST(nt + 1 AS DOUBLE) / 2) AS avg_rank
  FROM h
), s AS (
  SELECT
    CAST(SUM(c1) AS DOUBLE) AS n1,
    CAST(SUM(c2) AS DOUBLE) AS n2,
    SUM(c1 * avg_rank) AS r1,
    CAST(SUM(nt * nt * nt - nt) AS DOUBLE) AS ties
  FROM r
)
SELECT
  r1 - n1 * (n1 + 1) / 2 AS u1,
  n1 * n2 - (r1 - n1 * (n1 + 1) / 2) AS u2,
  ((r1 - n1 * (n1 + 1) / 2) - n1 * n2 / 2)
    / sqrt(n1 * n2 / 12
           * ((n1 + n2 + 1) - ties / ((n1 + n2) * (n1 + n2 - 1))))
    AS z_stat,
  CAST(n1 AS BIGINT) AS n_purchase,
  CAST(n2 AS BIGINT) AS n_click
FROM s
""",
)
def agg_mann_whitney_utest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``mannWhitneyUTest``: U1/U2 + tie-corrected z between purchase
    and click event values (cents-quantized, exact half-integer ranks)."""
    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    grp = F.col("event_type")
    h = ev.groupBy(cents.alias("v")).agg(
        F.sum(F.when(grp == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(grp == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
        F.count(F.lit(1)).cast("bigint").alias("nt"),
    )
    w_below = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    r = h.withColumn(
        "avg_rank",
        F.coalesce(F.sum("nt").over(w_below), F.lit(0))
        + (F.col("nt") + 1).cast("double") / 2,
    )
    s = r.agg(
        F.sum("c1").cast("double").alias("n1"),
        F.sum("c2").cast("double").alias("n2"),
        F.sum(F.col("c1") * F.col("avg_rank")).alias("r1"),
        F.sum(F.col("nt") * F.col("nt") * F.col("nt") - F.col("nt"))
        .cast("double")
        .alias("ties"),
    )
    n1, n2, r1, ties = (F.col(c) for c in ("n1", "n2", "r1", "ties"))
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n1 + n2
    z = (u1 - n1 * n2 / 2) / F.sqrt(
        n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    )
    return s.select(
        u1.alias("u1"),
        (n1 * n2 - u1).alias("u2"),
        z.alias("z_stat"),
        n1.cast("bigint").alias("n_purchase"),
        n2.cast("bigint").alias("n_click"),
    )
