"""windowFunnel: ClickHouse's product-analytics funnel aggregate.

Reference surface: ClickHouse `windowFunnel(window)(ts, cond1, cond2, ...)`
(parametric-functions reference; moosestack users reach it through raw CH
SQL).  Semantics implemented here — documented precisely because engines
differ on edge rules: per user, funnel_level is the longest prefix of the
step conditions matchable by events with STRICTLY increasing timestamps
where every step lands within `window` of the CHAIN'S FIRST event.

Spark-first design: no per-user Python state machine — each funnel level is
a semi-joinable existence question, so the whole aggregate is a cascade of
range joins on (user_id, ts-bounds).  Scale shape at 100 TB:

- each step frame is a pushed-down filtered scan of events (filter lands in
  the parquet scan, ReadSchema = 2 columns);
- joins shuffle on user_id only; per-user row groups are small, and the
  range predicate prunes pairs inside each group;
- after each level only the EARLIEST continuation per (user, start) is
  kept: min(prev) imposes the weakest `t2 > prev` constraint on the next
  step, so greedy is exact for chain existence.  This collapses the
  per-level intermediate to at most one row per (user, start) — a bot user
  with V views and C clicks contributes ≤ V rows at every level, never the
  V×C witness product a plain distinct would keep.

A step-k chain needs the step-(k-1) chain's start AND previous timestamps,
so intermediates carry (user_id, start_ts, min prev_ts) per level.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def _advance_level(chain: DataFrame, nxt: DataFrame, w: Column) -> DataFrame:
    """Extend every (u, start, prev) chain witness by one funnel step,
    keeping only the earliest continuation per (u, start).  min(prev) is
    exact for chain EXISTENCE: among witnesses sharing a start, the smallest
    prev admits a superset of possible next events, so any chain extendable
    from some witness is extendable from the min-prev one.  Bounds the
    intermediate at one row per (user, start) regardless of per-user event
    skew (tested with a 1k-view/1k-click bot in test_funnel.py)."""
    return (
        chain.join(
            nxt,
            (F.col("u") == F.col("u2"))
            & (F.col("t2") > F.col("prev"))
            & (F.col("t2") <= F.col("start") + w),
        )
        .groupBy("u", "start")
        .agg(F.min("t2").alias("prev"))
    )


def window_funnel(
    events: DataFrame,
    steps: list[Column],
    window_expr: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, funnel_level) for every user with at least one step-1
    event.  `steps` are boolean Columns over the events frame; window_expr
    is a SQL interval, e.g. "INTERVAL 12 HOURS"."""
    w = F.expr(window_expr)
    # step frames: minimal columns, filter pushed into the scan
    frames = [
        events.filter(cond).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        for cond in steps
    ]
    # chains[k] = (u, start, min prev) — one row per (user, start) witness
    chain = frames[0].select("u", F.col("t").alias("start"), F.col("t").alias("prev")).distinct()
    levels = [chain.select("u").distinct().withColumn("lvl", F.lit(1))]
    for k in range(1, len(frames)):
        nxt = frames[k].select(F.col("u").alias("u2"), F.col("t").alias("t2"))
        chain = _advance_level(chain, nxt, w)
        levels.append(chain.select("u").distinct().withColumn("lvl", F.lit(k + 1)))
    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.unionByName(lv)
    return (
        all_levels.groupBy("u")
        .agg(F.max("lvl").alias("funnel_level"))
        .select(F.col("u").alias(user_col), "funnel_level")
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
ch2 AS (
  SELECT v.user_id, v.ts AS start, MIN(c.ts) AS prev
  FROM v JOIN c ON c.user_id = v.user_id
   AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
  GROUP BY v.user_id, v.ts
),
ch3 AS (
  SELECT DISTINCT ch2.user_id
  FROM ch2 JOIN p ON p.user_id = ch2.user_id
   AND p.ts > ch2.prev AND p.ts <= ch2.start + INTERVAL 12 HOUR
),
lv AS (
  SELECT user_id, 1 AS lvl FROM (SELECT DISTINCT user_id FROM v)
  UNION ALL
  SELECT DISTINCT user_id, 2 AS lvl FROM ch2
  UNION ALL
  SELECT user_id, 3 AS lvl FROM ch3
),
ul AS (SELECT user_id, MAX(lvl) AS funnel_level FROM lv GROUP BY user_id)
SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS n_users
FROM ul GROUP BY funnel_level
""",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase within 12 hours of the first view; output
    is the funnel histogram (level -> user count)."""
    e = t(spark, sf_dir, "events")
    per_user = window_funnel(
        e,
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        "INTERVAL 12 HOURS",
    )
    return per_user.groupBy("funnel_level").agg(
        F.count(F.lit(1)).alias("n_users")
    )


# --------------------------------------------------------------------------
# retention (CH parametric aggregate): per-user condition flags where every
# later flag is AND-ed with the first (cohort-membership) condition, then
# summed.  One groupBy over events — conditional aggregation only, no
# joins: the single-shuffle shape that stays flat at 100 TB.
# --------------------------------------------------------------------------


def retention_counts(
    events: DataFrame, conds: list[Column], user_col: str = "user_id"
) -> DataFrame:
    """One row: r0 = users matching conds[0]; rk = users matching BOTH
    conds[0] and conds[k] (CH retention semantics)."""
    per_user = events.groupBy(user_col).agg(
        *[F.max(c.cast("int")).alias(f"c{i}") for i, c in enumerate(conds)]
    )
    aggs = [F.sum("c0").cast("bigint").alias("r0")]
    for i in range(1, len(conds)):
        aggs.append(
            F.sum((F.col("c0") == 1).cast("int") * F.col(f"c{i}"))
            .cast("bigint")
            .alias(f"r{i}")
        )
    return per_user.agg(*aggs)


@query(
    "retention_weekly",
    oracle="""
WITH per_user AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'signup'
          AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
         THEN 1 ELSE 0 END) AS c0,
    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
         THEN 1 ELSE 0 END) AS c1,
    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-22'
         THEN 1 ELSE 0 END) AS c2,
    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-22' AND ts < TIMESTAMP '2024-01-29'
         THEN 1 ELSE 0 END) AS c3
  FROM events GROUP BY user_id
)
SELECT
  CAST(SUM(c0) AS BIGINT) AS r0,
  CAST(SUM(c0 * c1) AS BIGINT) AS r1,
  CAST(SUM(c0 * c2) AS BIGINT) AS r2,
  CAST(SUM(c0 * c3) AS BIGINT) AS r3
FROM per_user
""",
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort = users who signed up in week 1 of 2024-01; rk = of those,
    how many were active in week k+1."""
    e = t(spark, sf_dir, "events")

    def in_week(k: int) -> Column:
        lo = F.lit(f"2024-01-{1 + 7 * k:02d}").cast("timestamp")
        hi = F.lit(f"2024-01-{8 + 7 * k:02d}").cast("timestamp")
        return (F.col("ts") >= lo) & (F.col("ts") < hi)

    conds = [
        (F.col("event_type") == "signup") & in_week(0),
        in_week(1),
        in_week(2),
        in_week(3),
    ]
    return retention_counts(e, conds)


# --------------------------------------------------------------------------
# sequenceMatch (CH parametric-functions sequenceMatch('(?1)(?2)...')):
# does a strictly-increasing-timestamp chain of the step conditions exist
# per user, with NO window bound (the windowed variant is window_funnel
# above).  Greedy earliest-completion is exact for existence, so the whole
# aggregate is a fold of (filter -> join on user -> min) steps — each step
# one shuffle on user_id, intermediates one row per user, monotonically
# shrinking.  No per-user state machine, no witness products.
# --------------------------------------------------------------------------


def sequence_match(
    events: DataFrame,
    steps: list[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Users whose event stream contains a strictly-increasing chain
    matching all step conditions (one row per matched user)."""
    cur = (
        events.filter(steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(ts_col).alias("t"))
    )
    for cond in steps[1:]:
        nxt = events.filter(cond).select(
            F.col(user_col).alias("u2"), F.col(ts_col).alias("t2")
        )
        cur = (
            nxt.join(cur, (F.col("u2") == F.col("u")) & (F.col("t2") > F.col("t")))
            .groupBy("u")
            .agg(F.min("t2").alias("t"))
        )
    return cur.select(F.col("u").alias(user_col))


@query(
    "agg_sequence_match",
    oracle="""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
e1 AS (SELECT user_id, MIN(ts) AS t FROM v GROUP BY user_id),
e2 AS (
  SELECT c.user_id, MIN(c.ts) AS t
  FROM c JOIN e1 ON c.user_id = e1.user_id AND c.ts > e1.t
  GROUP BY c.user_id
),
e3 AS (
  SELECT DISTINCT p.user_id
  FROM p JOIN e2 ON p.user_id = e2.user_id AND p.ts > e2.t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matched FROM e3
""",
)
def agg_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count of users with a view -> click -> purchase chain anywhere in
    their history (unwindowed sequenceMatch); the oracle replays the same
    greedy earliest-chain construction."""
    e = t(spark, sf_dir, "events")
    matched = sequence_match(
        e,
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
    )
    return matched.agg(F.count(F.lit(1)).cast("bigint").alias("n_matched"))


# --------------------------------------------------------------------------
# sequenceCount (CH sequenceCount('(?1)(?2)')(ts, c1, c2)): the number of
# NON-OVERLAPPING cond1 -> cond2 chains per user.  Greedy earliest-matching
# is optimal (interval scheduling), and for a 2-step pattern the greedy
# count collapses to a prefix-sum identity — matched = total_B - max(0,
# max_k (B_k - A_k)) over time-ordered prefixes (ballot-problem argument:
# the prefix where B-events most exceed A-events pins exactly how many B's
# can never find an earlier unmatched A).  That makes the whole aggregate
# ONE window pass over (user, ts) plus a groupBy — no per-user state
# machine, mirrored verbatim in the oracle.  K-step patterns lose the
# closed form; their sequential spelling is the applyInPandas path.
# --------------------------------------------------------------------------


@query(
    "agg_sequence_count",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_a,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_b
  FROM events
  WHERE event_type IN ('view', 'click')
), pref AS (
  SELECT user_id,
         SUM(is_b) OVER w - SUM(is_a) OVER w AS b_minus_a,
         SUM(is_b) OVER (PARTITION BY user_id) AS b_tot
  FROM flagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
), per_user AS (
  SELECT user_id,
         CAST(MAX(b_tot) - GREATEST(0, MAX(b_minus_a)) AS BIGINT) AS n_chains
  FROM pref GROUP BY user_id
)
SELECT user_id, n_chains FROM per_user WHERE n_chains > 0
""",
)
def agg_sequence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user, the number of disjoint view -> click chains (each click
    consumes the earliest unmatched earlier view).  One window exchange on
    user_id + one groupBy on the same key (exchange reuse): flat at any
    event volume."""
    from pyspark.sql import Window

    e = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "user_id",
            "ts",
            "event_id",
            (F.col("event_type") == "view").cast("int").alias("is_a"),
            (F.col("event_type") == "click").cast("int").alias("is_b"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pref = e.select(
        "user_id",
        (F.sum("is_b").over(w) - F.sum("is_a").over(w)).alias("b_minus_a"),
        F.sum("is_b").over(Window.partitionBy("user_id")).alias("b_tot"),
    )
    return (
        pref.groupBy("user_id")
        .agg(
            (F.max("b_tot") - F.greatest(F.lit(0), F.max("b_minus_a")))
            .cast("bigint")
            .alias("n_chains")
        )
        .filter(F.col("n_chains") > 0)
    )


# --------------------------------------------------------------------------
# windowFunnel 'strict_order' mode: steps must follow each other DIRECTLY
# in the user's event stream (no other event in between).  A strict chain
# is a consecutive run, so the whole mode collapses to ONE window pass
# with lead(): an event starts a level-k chain iff it matches step 1 and
# its next k-1 events match the remaining steps inside the window.  No
# joins, no witness state — strictness makes the funnel cheaper, not
# costlier.
# --------------------------------------------------------------------------


@query(
    "funnel_strict_order",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, event_type,
         lead(event_type, 1) OVER w AS t1, lead(ts, 1) OVER w AS ts1,
         lead(event_type, 2) OVER w AS t2, lead(ts, 2) OVER w AS ts2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), lv AS (
  SELECT user_id,
    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
    MAX(CASE WHEN event_type = 'view' AND t1 = 'click'
          AND ts1 <= ts + INTERVAL 12 HOUR THEN 1 ELSE 0 END) AS l2,
    MAX(CASE WHEN event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
          AND ts2 <= ts + INTERVAL 12 HOUR THEN 1 ELSE 0 END) AS l3
  FROM seq GROUP BY user_id
), ul AS (
  SELECT user_id, l1 + l2 + l3 AS funnel_level FROM lv WHERE l1 = 1
)
SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS n_users
FROM ul GROUP BY funnel_level
""",
)
def funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase with STRICT order (consecutive events, no
    interlopers) within 12 hours of the view: one lead() window pass per
    user, conditional aggregation, histogram output.  Level monotonicity
    (l1 >= l2 >= l3 as max-flags) makes funnel_level = l1+l2+l3."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("ts", 1).over(w).alias("ts1"),
        F.lead("event_type", 2).over(w).alias("t2"),
        F.lead("ts", 2).over(w).alias("ts2"),
    )
    hour12 = F.expr("INTERVAL 12 HOURS")
    lv = seq.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("l1"),
        F.max(
            (
                (F.col("event_type") == "view")
                & (F.col("t1") == "click")
                & (F.col("ts1") <= F.col("ts") + hour12)
            ).cast("int")
        ).alias("l2"),
        F.max(
            (
                (F.col("event_type") == "view")
                & (F.col("t1") == "click")
                & (F.col("t2") == "purchase")
                & (F.col("ts2") <= F.col("ts") + hour12)
            ).cast("int")
        ).alias("l3"),
    )
    return (
        lv.filter(F.col("l1") == 1)
        .select(
            "user_id",
            (F.col("l1") + F.col("l2") + F.col("l3")).alias("funnel_level"),
        )
        .groupBy("funnel_level")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


# --------------------------------------------------------------------------
# windowFunnel mode family (CH parity: strict_increase / strict_dedup) under
# GREEDY first-match scan semantics: from each step-1 event, step k+1 is the
# EARLIEST step-(k+1) event after the current chain head (ClickHouse's
# sorted-scan takes the first match), so every (user, start) has exactly one
# chain — no witness sets, and each level advance is one min-aggregated join
# (bounded at one row per (user, start), the skew-safe shape of
# _advance_level).
#
# - default: next event at ts >= prev (equal timestamps chain, as in CH's
#   sorted scan; distinct step conditions here, so an event never matches
#   two steps);
# - strict_increase: ts > prev only;
# - strict_dedup: built on strict_increase, and the chain DIES if any event
#   matching an already-matched step occurs strictly between the chain head
#   and the found next step (CH: a repeating event interrupts processing).
#   Blocker check = one more min-join per level: first any-earlier-step
#   event after the head, compared against the found next.
# --------------------------------------------------------------------------


def window_funnel_greedy(
    events: DataFrame,
    steps: list[Column],
    window_expr: str,
    mode: str = "default",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, funnel_level) under greedy first-match scan semantics.
    mode in {'default', 'strict_increase', 'strict_dedup'}."""
    if mode not in ("default", "strict_increase", "strict_dedup"):
        raise ValueError(f"unknown windowFunnel mode {mode!r}")
    w = F.expr(window_expr)
    frames = [
        events.filter(cond).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        for cond in steps
    ]
    chain = frames[0].select(
        "u", F.col("t").alias("start"), F.col("t").alias("prev")
    ).distinct()
    levels = [chain.select("u").distinct().withColumn("lvl", F.lit(1))]
    strict = mode != "default"
    for k in range(1, len(frames)):
        nxt = frames[k].select(F.col("u").alias("u2"), F.col("t").alias("t2"))
        t_after = F.col("t2") > F.col("prev") if strict else (
            F.col("t2") >= F.col("prev")
        )
        advanced = (
            chain.join(
                nxt,
                (F.col("u") == F.col("u2"))
                & t_after
                & (F.col("t2") <= F.col("start") + w),
            )
            .groupBy("u", "start")
            .agg(F.min("t2").alias("nxt_t"))
        )
        if mode == "strict_dedup":
            # first event matching ANY already-matched step strictly after
            # the chain head; chain survives only if the next step comes
            # first (ties: blocker at exactly nxt_t does not kill)
            matched = frames[0]
            for fr in frames[1:k]:
                matched = matched.unionByName(fr)
            # join back the chain head (prev) to scope the blocker scan
            headed = advanced.join(
                chain.select("u", "start", "prev"), ["u", "start"]
            )
            blocker = (
                headed.join(
                    matched.select(
                        F.col("u").alias("u3"), F.col("t").alias("t3")
                    ),
                    (F.col("u") == F.col("u3")) & (F.col("t3") > F.col("prev")),
                    "left",
                )
                .groupBy("u", "start", "nxt_t")
                .agg(F.min("t3").alias("blk_t"))
            )
            chain = (
                blocker.filter(
                    F.col("blk_t").isNull() | (F.col("blk_t") >= F.col("nxt_t"))
                )
                .select("u", "start", F.col("nxt_t").alias("prev"))
            )
        else:
            chain = advanced.select("u", "start", F.col("nxt_t").alias("prev"))
        levels.append(
            chain.select("u").distinct().withColumn("lvl", F.lit(k + 1))
        )
    all_levels = levels[0]
    for lv in levels[1:]:
        all_levels = all_levels.unionByName(lv)
    return (
        all_levels.groupBy("u")
        .agg(F.max("lvl").alias("funnel_level"))
        .select(F.col("u").alias(user_col), "funnel_level")
    )


def _funnel_modes_oracle() -> str:
    mode_sql = []
    for mode, op in (("default", ">="), ("strict_increase", ">")):
        mode_sql.append(f"""
ch2_{mode} AS (
  SELECT s.user_id, s.ts AS start, MIN(c.ts) AS prev
  FROM v s JOIN c ON c.user_id = s.user_id
   AND c.ts {op} s.ts AND c.ts <= s.ts + INTERVAL 12 HOUR
  GROUP BY s.user_id, s.ts
),
ch3_{mode} AS (
  SELECT ch.user_id, ch.start, MIN(p.ts) AS prev
  FROM ch2_{mode} ch JOIN p ON p.user_id = ch.user_id
   AND p.ts {op} ch.prev AND p.ts <= ch.start + INTERVAL 12 HOUR
  GROUP BY ch.user_id, ch.start
),
ul_{mode} AS (
  SELECT user_id, MAX(lvl) AS funnel_level FROM (
    SELECT DISTINCT user_id, 1 AS lvl FROM v
    UNION ALL SELECT DISTINCT user_id, 2 FROM ch2_{mode}
    UNION ALL SELECT DISTINCT user_id, 3 FROM ch3_{mode}
  ) GROUP BY user_id
)""")
    dedup_sql = """
d2 AS (
  SELECT s.user_id, s.ts AS start, s.ts AS head, MIN(c.ts) AS nxt
  FROM v s JOIN c ON c.user_id = s.user_id
   AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL 12 HOUR
  GROUP BY s.user_id, s.ts
),
d2b AS (
  SELECT d.user_id, d.start, d.nxt AS prev
  FROM d2 d LEFT JOIN (
    SELECT d.user_id AS uu, d.start AS ss, MIN(b.ts) AS blk
    FROM d2 d JOIN v b ON b.user_id = d.user_id AND b.ts > d.head
    GROUP BY d.user_id, d.start
  ) bl ON bl.uu = d.user_id AND bl.ss = d.start
  WHERE bl.blk IS NULL OR bl.blk >= d.nxt
),
d3 AS (
  SELECT d.user_id, d.start, d.prev AS head, MIN(p.ts) AS nxt
  FROM d2b d JOIN p ON p.user_id = d.user_id
   AND p.ts > d.prev AND p.ts <= d.start + INTERVAL 12 HOUR
  GROUP BY d.user_id, d.start, d.prev
),
d3b AS (
  SELECT d.user_id
  FROM d3 d LEFT JOIN (
    SELECT d.user_id AS uu, d.start AS ss, MIN(b.ts) AS blk
    FROM d3 d JOIN (SELECT user_id, ts FROM v UNION ALL
                    SELECT user_id, ts FROM c) b
      ON b.user_id = d.user_id AND b.ts > d.head
    GROUP BY d.user_id, d.start
  ) bl ON bl.uu = d.user_id AND bl.ss = d.start
  WHERE bl.blk IS NULL OR bl.blk >= d.nxt
),
ul_strict_dedup AS (
  SELECT user_id, MAX(lvl) AS funnel_level FROM (
    SELECT DISTINCT user_id, 1 AS lvl FROM v
    UNION ALL SELECT DISTINCT user_id, 2 FROM d2b
    UNION ALL SELECT DISTINCT user_id, 3 FROM d3b
  ) GROUP BY user_id
)"""
    return f"""
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
{",".join(mode_sql)},
{dedup_sql}
SELECT 'default' AS mode, funnel_level, CAST(COUNT(*) AS BIGINT) AS n_users
FROM ul_default GROUP BY funnel_level
UNION ALL
SELECT 'strict_increase', funnel_level, CAST(COUNT(*) AS BIGINT)
FROM ul_strict_increase GROUP BY funnel_level
UNION ALL
SELECT 'strict_dedup', funnel_level, CAST(COUNT(*) AS BIGINT)
FROM ul_strict_dedup GROUP BY funnel_level
"""


@query("funnel_modes_compare", oracle=_funnel_modes_oracle())
def funnel_modes_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase histograms under all three greedy
    windowFunnel modes side by side; the dedup column shows how many chains
    a repeat view/click kills."""
    e = t(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = None
    for mode in ("default", "strict_increase", "strict_dedup"):
        h = (
            window_funnel_greedy(e, steps, "INTERVAL 12 HOURS", mode=mode)
            .groupBy("funnel_level")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(F.lit(mode).alias("mode"), "funnel_level", "n_users")
        )
        out = h if out is None else out.unionByName(h)
    return out


_SEQ_MATCH_TIMED_SQL = """
WITH src AS (
  SELECT CAST(user_id % 200 AS BIGINT) AS cohort, ts, event_id, event_type
  FROM events
  WHERE event_type IN ('view', 'click')
),
timed AS (
  SELECT cohort, ts, event_type,
         MAX(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY cohort ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_ts
  FROM src
)
SELECT cohort,
       CAST(MAX(CASE WHEN event_type = 'click' AND last_view_ts IS NOT NULL
                      AND CAST(ts AS TIMESTAMP) <= last_view_ts
                          + INTERVAL 2 HOUR
                     THEN 1 ELSE 0 END) AS INT) AS seq2t
FROM timed
GROUP BY cohort
ORDER BY cohort
"""


@query("agg_sequence_match_timed", oracle=_SEQ_MATCH_TIMED_SQL)
def agg_sequence_match_timed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH sequenceMatch with a TIME CONSTRAINT —
    sequenceMatch('(?1)(?t<=2h)(?2)')(ts, view, click) — the form the
    unwindowed gate (agg_sequence_match) cannot express.  Greedy earliest-
    match is WRONG here: the first view can miss the bound while a later
    view succeeds.  Correct existence on a two-condition alphabet: for
    each click, the MOST RECENT prior view within bound (any intervening
    view only tightens the gap; an intervening click within bound would
    itself be a match), i.e. one lag-max window per cohort + a groupBy on
    the same key — exchange reused, exact timestamp arithmetic, same SQL
    on both engines."""
    from moosestack_spark.tables import register_views

    register_views(spark, sf_dir, only=["events"])
    return spark.sql(_SEQ_MATCH_TIMED_SQL)


# --------------------------------------------------------------------------
# Time-to-convert distribution: per user, first view -> first purchase AT OR
# AFTER that view; exact integer microsecond deltas aggregated to count /
# min / max (BIGINT) and exact interpolated median / p90 (Spark
# `percentile` == DuckDB `quantile_cont` on integer-valued doubles — the
# ts_anomaly_mad precedent).  Two groupBys + one user-id join — never a
# global sort of raw events.
# --------------------------------------------------------------------------


@query(
    "funnel_time_to_convert",
    oracle="""
WITH v0 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
), conv AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) - MAX(v0.v_us) AS delta_us
  FROM events e JOIN v0 USING (user_id)
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v0.v_us
  GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM v0) AS BIGINT) AS n_viewers,
       CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(MIN(delta_us) AS BIGINT) AS min_us,
       quantile_cont(CAST(delta_us AS DOUBLE), 0.5) AS median_us,
       quantile_cont(CAST(delta_us AS DOUBLE), 0.9) AS p90_us,
       CAST(MAX(delta_us) AS BIGINT) AS max_us
FROM conv
""",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view -> first-subsequent-purchase latency distribution.
    MAX(v_us) inside the per-user group is a no-op (v0 has one row per
    user) kept so Spark and DuckDB aggregate identically."""
    e = t(spark, sf_dir, "events")
    v0 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("v_us"))
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(v0, "user_id")
        .filter(F.unix_micros("ts") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(
            (F.min(F.unix_micros("ts")) - F.max("v_us")).alias("delta_us")
        )
    )
    n_viewers = v0.count()
    return conv.agg(
        F.lit(n_viewers).cast("bigint").alias("n_viewers"),
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.min("delta_us").cast("bigint").alias("min_us"),
        F.expr("percentile(cast(delta_us as double), 0.5)").alias("median_us"),
        F.expr("percentile(cast(delta_us as double), 0.9)").alias("p90_us"),
        F.max("delta_us").cast("bigint").alias("max_us"),
    )
