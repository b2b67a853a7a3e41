"""Join operators (SURVEY.md §2.3).

The reference's join surface: named lookup joins with leftKey/rightKey and a
type defaulting to LEFT (ts-moose-lib/src/query-layer/query-model.ts:193-205,
:683-708), arbitrary `on` fragments (theta joins), and raw-SQL passthrough.
Join algorithm selection is delegated to Catalyst exactly as the reference
delegates it to ClickHouse.

Scale notes baked into these plans:
- dimension joins (customer, nation, region, supplier, part at small SF)
  broadcast — no shuffle of the fact table; verified via explain() in tests;
- fact-fact equi-joins shuffle on the join key once, and AQE handles skew;
- the theta join keeps one broadcastable side so it never degenerates into a
  cartesian shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import dsum, sql_dsum
from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# Default lookup join: LEFT equi-join orders->customer (query-model.ts:699
# `type ?? "LEFT"`), with join-column projection ({join:"cust", column:...}).
# --------------------------------------------------------------------------


@query(
    "join_left_lookup",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_left_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    # customer grows with SF — let AQE/autoBroadcastJoinThreshold decide
    # broadcast vs shuffled hash rather than forcing a hint that would OOM
    # a 1000-executor run at 100 TB.
    return o.join(c, o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


# --------------------------------------------------------------------------
# Multi-join: lineitem ⋈ part ⋈ supplier ⋈ nation — star-schema join with
# every dimension broadcast; the only shuffle is the final aggregation.
# --------------------------------------------------------------------------


@query(
    "join_star_multi",
    oracle=f"""
SELECT
  n.n_name AS nation,
  p.p_brand AS brand,
  {sql_dsum('l.l_extendedprice')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name, p.p_brand
""",
)
def join_star_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        # nation is fixed-size (25 rows at any SF) — safe to force broadcast;
        # part/supplier scale with SF, so Catalyst decides from stats.
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(n.n_name.alias("nation"), p.p_brand.alias("brand"))
        .agg(
            dsum("l_extendedprice").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Arbitrary-`on` theta join (query-model.ts "on" fragment): lineitems shipped
# before their order date (data-quality check shape).  Equi part on the key
# keeps it a hash join; the inequality is a post-join residual.
# --------------------------------------------------------------------------


@query(
    "join_theta",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate, o.o_orderdate
FROM lineitem l
JOIN orders o
  ON l.l_orderkey = o.o_orderkey AND l.l_shipdate < o.o_orderdate
""",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return li.join(
        o, (li.l_orderkey == o.o_orderkey) & (li.l_shipdate < o.o_orderdate)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "o_orderdate")


# --------------------------------------------------------------------------
# RIGHT / FULL joins (type strings pass through — query-model.ts:699).
# Full-outer over per-side aggregates exercises null-filling on both sides.
# --------------------------------------------------------------------------


@query(
    "join_full_outer",
    oracle="""
SELECT
  COALESCE(co.nationkey, so.nationkey) AS nationkey,
  co.n_customers,
  so.n_suppliers
FROM
  (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
   FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey) co
FULL JOIN
  (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
   FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey) so
ON co.nationkey = so.nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    co = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    so = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return co.join(so, "nationkey", "full").select(
        F.col("nationkey"), "n_customers", "n_suppliers"
    )


# --------------------------------------------------------------------------
# Semi / anti joins — available via raw SQL in the reference (EXISTS / NOT
# EXISTS); first-class DataFrame ops here.  Anti join = customers with no
# orders; at scale this is a broadcast/shuffled hash anti join, never a
# subquery-per-row.
# --------------------------------------------------------------------------


@query(
    "join_semi_anti",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM customer c WHERE EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
  (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
     (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders
""",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").count()
    return spark.createDataFrame(
        [(with_orders, without)], "with_orders bigint, without_orders bigint"
    )


# --------------------------------------------------------------------------
# As-of join — NOT in Spark's join vocabulary (and only reachable via raw
# SQL in the reference).  Composition of existing ops: tag both sides, union
# on the `by` keys, one window pass carrying the latest right-side value
# forward.  ONE shuffle on the by-keys, state per partition is a single
# carried value — at 100 TB this beats a range join (no pair explosion) and
# beats merge_asof-style applyInPandas (no Python in the hot path).
# --------------------------------------------------------------------------

from pyspark.sql import Window as _W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join with exact matches: for every left row, attach
    `value_cols` from the latest right row with right.on <= left.on within
    the same `by` group (NULL when no prior right row exists).

    Equal-`on` ties: right rows sort BEFORE left rows (exact match wins);
    among equal-`on` right rows the largest `tiebreak` value wins
    (deterministic).
    """
    lcols = left.columns
    tb = [tiebreak] if tiebreak else []
    l = left.withColumn("__is_right", F.lit(0))
    for v in value_cols:
        l = l.withColumn(f"__rv_{v}", F.lit(None).cast(right.schema[v].dataType))
    for c in tb:
        l = l.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *by,
        F.col(on),
        *tb,
        *[F.col(v).alias(f"__rv_{v}") for v in value_cols],
        F.lit(1).alias("__is_right"),
    )
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    ucols = [*lcols, *tb, "__is_right", *[f"__rv_{v}" for v in value_cols]]
    u = l.select(*ucols).unionByName(r.select(*ucols))
    order = [F.col(on).asc(), F.col("__is_right").desc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc_nulls_first())
    w = (
        _W.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(_W.unboundedPreceding, _W.currentRow)
    )
    out = u
    for v in value_cols:
        out = out.withColumn(
            f"asof_{v}", F.last(f"__rv_{v}", ignorenulls=True).over(w)
        )
    return out.filter(F.col("__is_right") == 0).select(
        *lcols, *[f"asof_{v}" for v in value_cols]
    )


@query(
    "join_asof",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS rv, 0 AS is_right
  FROM events WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, value AS rv, 1 AS is_right
  FROM events WHERE event_type = 'purchase'
), scanned AS (
  SELECT user_id, ts, event_id, is_right,
         LAST_VALUE(rv IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, is_right DESC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS asof_value
  FROM u
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       asof_value
FROM scanned WHERE is_right = 0
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every non-purchase event annotated with the user's most recent
    purchase value as of the event time (cites the operator gap: reference
    §2.3 has no as-of joins; DataFrame API has none either)."""
    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("__tb")
    )
    out = asof_join(
        left, right, on="ts", by=["user_id"], value_cols=["value"], tiebreak="__tb"
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col("asof_value").alias("asof_value"),
    )


def asof_join_tolerance(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance_seconds: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join with a MAX-GAP tolerance: the matched right row
    must lie within `tolerance_seconds` before the left row, else NULL
    (pandas merge_asof(tolerance=...) / QuestDB ASOF ... TOLERANCE).  Built
    on asof_join by carrying the matched right timestamp as an extra value
    column and gating every asof value on the observed gap — still one
    union + one window pass, no extra shuffle."""
    right2 = right.withColumn("__rt", F.col(on))
    out = asof_join(left, right2, on, by, [*value_cols, "__rt"], tiebreak)
    within = (
        F.unix_micros(F.col(on)) - F.unix_micros(F.col("asof___rt"))
    ) <= tolerance_seconds * 1_000_000
    for v in value_cols:
        out = out.withColumn(f"asof_{v}", F.when(within, F.col(f"asof_{v}")))
    return out.drop("asof___rt")


@query(
    "join_asof_tolerance",
    oracle="""
WITH u AS (
  SELECT user_id, ts, event_id, CAST(NULL AS DOUBLE) AS rv,
         CAST(NULL AS TIMESTAMP) AS rts, 0 AS is_right
  FROM events WHERE event_type <> 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, value AS rv, ts AS rts, 1 AS is_right
  FROM events WHERE event_type = 'purchase'
), scanned AS (
  SELECT user_id, ts, event_id, is_right,
         LAST_VALUE(rv IGNORE NULLS) OVER w AS asof_value,
         LAST_VALUE(rts IGNORE NULLS) OVER w AS asof_ts
  FROM u
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY ts ASC, is_right DESC, event_id ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  )
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       CASE WHEN ts - asof_ts <= INTERVAL 1 HOUR THEN asof_value END
         AS asof_value
FROM scanned WHERE is_right = 0
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_asof with a 1-hour staleness bound: a purchase older than an
    hour no longer annotates the event.  The tolerance is evaluated on the
    already-joined row (integer microsecond compare), so the plan is
    byte-identical to join_asof plus one projection."""
    e = t(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("__tb")
    )
    out = asof_join_tolerance(
        left,
        right,
        on="ts",
        by=["user_id"],
        value_cols=["value"],
        tolerance_seconds=3600,
        tiebreak="__tb",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.col("asof_value").alias("asof_value"),
    )


# --------------------------------------------------------------------------
# Range (interval-containment) join — bucketized to an equi-join.  A naive
# value BETWEEN lo AND hi join is a BroadcastNestedLoopJoin (O(n*m) compares
# per partition); decomposing each interval into the fixed-step buckets it
# covers turns it into a hash equi-join on the bucket id + a residual exact
# filter — the shape that scales when the dim side is too big to broadcast.
# --------------------------------------------------------------------------


def range_join_buckets(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    step: float,
) -> DataFrame:
    """Join fact rows to interval rows with lo <= value < hi via a
    bucket-exploded equi-join on floor(value/step)."""
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / step).cast("long"),
                F.floor(F.col(hi_col) / step).cast("long"),
            )
        ),
    )
    f = fact.withColumn("__bucket", F.floor(F.col(value_col) / step).cast("long"))
    return f.join(r, "__bucket").filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    ).drop("__bucket")


_RANGE_ROWS = [
    ("tiny", 0.0, 50.0),
    ("small", 50.0, 120.0),
    ("mid", 120.0, 200.0),
    ("large", 200.0, 300.0),
    ("xl", 300.0, 420.0),
    ("huge", 420.0, 550.0),
]

_RANGE_VALUES_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in _RANGE_ROWS)


@query(
    "join_range_buckets",
    oracle=f"""
WITH ranges(label, lo, hi) AS (VALUES {_RANGE_VALUES_SQL})
SELECT label, COUNT(*) AS n, {sql_dsum('value')} AS sum_value
FROM events e JOIN ranges r ON e.value >= r.lo AND e.value < r.hi
GROUP BY label
""",
)
def join_range_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events bucketed into value intervals via the bucketized range join,
    aggregated per interval label."""
    e = t(spark, sf_dir, "events").select("event_id", "value")
    # VALUES literal, not createDataFrame: the python-RDD path would cost a
    # serialization job + an extra broadcast job (~2s cold) for 6 rows
    ranges = spark.sql(
        f"SELECT * FROM (VALUES {_RANGE_VALUES_SQL}) AS t(label, lo, hi)"
    )
    joined = range_join_buckets(e, ranges, "value", "lo", "hi", step=60.0)
    return joined.groupBy("label").agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sum_value")
    )


# --------------------------------------------------------------------------
# Classic analytics shapes (raw-SQL passthrough territory in the reference;
# first-class here): TPC-H Q3/Q5-style multi-join aggregations over the
# full star schema.  Plan shape: fact scan with pushed date filters,
# broadcast dimension joins, single agg shuffle, top-k sort.
# --------------------------------------------------------------------------


@query(
    "analytics_shipping_priority",
    oracle="""
SELECT
  l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by order, top 10."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(8,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "analytics_local_supplier_volume",
    oracle="""
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def analytics_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where supplier and customer share a nation,
    per Asian nation.  Six-table join; every dimension side broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(3,2)")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(8,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Interval-overlap join (interval x interval — join_range_buckets above is
# point-in-range with a broadcast dimension; this is the symmetric case
# where BOTH sides are big interval sets and a theta join would be
# quadratic).  Scalable shape: decompose each interval into coarse grid
# cells (duplication bounded by span/grid per row), equi-join on the cell,
# verify exact overlap, and keep each pair ONLY at its canonical cell —
# floor(max(starts)/grid), the first overlapping cell — so no distinct()
# pass is needed (the standard dedup-free spatial-join trick).
# --------------------------------------------------------------------------


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    grid: int,
    a_cols: tuple[str, str, str] = ("a_id", "a_start", "a_end"),
    b_cols: tuple[str, str, str] = ("b_id", "b_start", "b_end"),
) -> DataFrame:
    """Pairs of half-open intervals [start, end) that overlap, with the
    exact overlap length.  One equi-join shuffle on the grid cell."""
    aid, as_, ae = a_cols
    bid, bs, be = b_cols

    def cells(df, s, e):
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / grid), F.floor((F.col(e) - 1) / grid)
                )
            ),
        )

    ac = cells(a.select(aid, as_, ae), as_, ae)
    bc = cells(b.select(bid, bs, be), bs, be)
    joined = ac.join(bc, "__cell")
    overlap = joined.filter(
        (F.col(as_) < F.col(be)) & (F.col(bs) < F.col(ae))
    ).filter(
        F.col("__cell") == F.floor(F.greatest(F.col(as_), F.col(bs)) / grid)
    )
    return overlap.select(
        aid,
        bid,
        (
            F.least(F.col(ae), F.col(be))
            - F.greatest(F.col(as_), F.col(bs))
        ).alias("overlap_len"),
    )


@query(
    "join_interval_overlap",
    oracle="""
WITH a AS (
  SELECT event_id AS a_id,
         CAST(user_id % 997 AS BIGINT) AS a_start,
         CAST(user_id % 997 + event_id % 50 + 1 AS BIGINT) AS a_end
  FROM events WHERE event_id % 7 = 0
),
b AS (
  SELECT o_orderkey AS b_id,
         CAST(o_orderkey % 1009 AS BIGINT) AS b_start,
         CAST(o_orderkey % 1009 + o_orderkey % 40 + 1 AS BIGINT) AS b_end
  FROM orders WHERE o_orderkey % 101 = 0
),
pairs AS (
  SELECT a_id, b_id,
         LEAST(a_end, b_end) - GREATEST(a_start, b_start) AS ov
  FROM a JOIN b ON a_start < b_end AND b_start < a_end
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(ov) AS BIGINT) AS total_overlap,
       CAST(COUNT(DISTINCT a_id) AS BIGINT) AS a_touched,
       CAST(COUNT(DISTINCT b_id) AS BIGINT) AS b_touched
FROM pairs
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval x interval overlap join via grid decomposition with
    canonical-cell dedup (one equi-join shuffle; a theta join — which the
    ORACLE deliberately uses as the independent formulation — would be
    O(|A| * |B|))."""
    a = t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0).select(
        F.col("event_id").alias("a_id"),
        (F.col("user_id") % 997).cast("bigint").alias("a_start"),
        (F.col("user_id") % 997 + F.col("event_id") % 50 + 1)
        .cast("bigint")
        .alias("a_end"),
    )
    b = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 101 == 0).select(
        F.col("o_orderkey").alias("b_id"),
        (F.col("o_orderkey") % 1009).cast("bigint").alias("b_start"),
        (F.col("o_orderkey") % 1009 + F.col("o_orderkey") % 40 + 1)
        .cast("bigint")
        .alias("b_end"),
    )
    pairs = interval_overlap_join(a, b, grid=64)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("overlap_len").cast("bigint").alias("total_overlap"),
        F.count_distinct("a_id").alias("a_touched"),
        F.count_distinct("b_id").alias("b_touched"),
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
WITH clean AS (
  SELECT s_suppkey AS c_key, s_name AS c_name,
         substr(s_name, 10, 3) AS blk
  FROM supplier
),
dirty AS (
  SELECT s_suppkey AS d_key,
         CASE CAST(s_suppkey % 3 AS INT)
           WHEN 0 THEN substr(s_name, 1, length(s_name) - 1)
           WHEN 1 THEN substr(s_name, 1, length(s_name) - 2)
                    || substr(s_name, length(s_name), 1)
                    || substr(s_name, length(s_name) - 1, 1)
           ELSE substr(s_name, 1, length(s_name) - 1) || 'X'
         END AS d_name,
         substr(s_name, 10, 3) AS blk
  FROM supplier
),
cand AS (
  SELECT d_key, c_key, levenshtein(d_name, c_name) AS dist
  FROM dirty JOIN clean USING (blk)
  WHERE levenshtein(d_name, c_name) <= 2
),
best AS (
  SELECT d_key, c_key, dist FROM (
    SELECT d_key, c_key, dist,
           ROW_NUMBER() OVER (PARTITION BY d_key
                              ORDER BY dist, c_key) AS rn
    FROM cand
  ) WHERE rn = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN d_key = c_key THEN 1 ELSE 0 END) AS BIGINT)
         AS n_recovered,
       CAST(SUM(dist) AS BIGINT) AS total_dist
FROM best
""",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join with BLOCKING: deterministically
    perturbed supplier names (truncate / adjacent swap / trailing
    replace) matched back to the clean list — equi-join on a blocking key
    (digit prefix, stable under the perturbations) bounds candidate pairs
    to block sizes instead of |A|x|B|, then exact Levenshtein <= 2 verify
    and best-match-per-dirty-row (min distance, id tiebreak).  Outputs
    exact integers: matches, correct recoveries, total edit distance."""
    sup = t(spark, sf_dir, "supplier")
    clean = sup.select(
        F.col("s_suppkey").alias("c_key"),
        F.col("s_name").alias("c_name"),
        F.expr("substr(s_name, 10, 3)").alias("blk"),
    )
    dirty = sup.select(
        F.col("s_suppkey").alias("d_key"),
        F.expr(
            "CASE CAST(s_suppkey % 3 AS INT) "
            "WHEN 0 THEN substr(s_name, 1, length(s_name) - 1) "
            "WHEN 1 THEN concat(substr(s_name, 1, length(s_name) - 2), "
            "substr(s_name, length(s_name), 1), "
            "substr(s_name, length(s_name) - 1, 1)) "
            "ELSE concat(substr(s_name, 1, length(s_name) - 1), 'X') END"
        ).alias("d_name"),
        F.expr("substr(s_name, 10, 3)").alias("blk"),
    )
    cand = (
        dirty.join(clean, "blk")
        .withColumn("dist", F.levenshtein("d_name", "c_name"))
        .filter(F.col("dist") <= 2)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("d_key").orderBy("dist", "c_key")
    best = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return best.agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.sum((F.col("d_key") == F.col("c_key")).cast("int"))
        .cast("bigint")
        .alias("n_recovered"),
        F.sum("dist").cast("bigint").alias("total_dist"),
    )


# --------------------------------------------------------------------------
# Nearest-event join (both directions): each purchase matches the error
# event of the same user with minimum |Δt|, ties to the EARLIER side.
# Not an asof join (asof looks one way); implemented as ONE interleaved
# per-user window pass — carry the last error backward and the first error
# forward, then pick the nearer — instead of a range join, so the cost is
# a single shuffle on user_id and O(1) carried state per row.  Reference
# parity: CH users write this as ASOF JOIN pairs + argMin; the reference
# has no native nearest join either (SURVEY.md §2.3).
# --------------------------------------------------------------------------


@query(
    "join_nearest_event",
    oracle="""
WITH tagged AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) AS us,
         CASE WHEN event_type = 'error' THEN epoch_us(ts) END AS err_us,
         CASE WHEN event_type = 'error' THEN event_id END AS err_id
  FROM events
), carried AS (
  SELECT event_id, user_id, event_type, us,
         LAST_VALUE(err_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS before_us,
         LAST_VALUE(err_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS before_id,
         FIRST_VALUE(err_us IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS after_us,
         FIRST_VALUE(err_id IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS after_id
  FROM tagged
)
SELECT event_id AS purchase_id,
       CASE
         WHEN before_us IS NULL AND after_us IS NULL THEN NULL
         WHEN after_us IS NULL THEN before_id
         WHEN before_us IS NULL THEN after_id
         WHEN us - before_us <= after_us - us THEN before_id
         ELSE after_id
       END AS error_id,
       CASE
         WHEN before_us IS NULL AND after_us IS NULL THEN NULL
         WHEN after_us IS NULL THEN us - before_us
         WHEN before_us IS NULL THEN after_us - us
         ELSE LEAST(us - before_us, after_us - us)
       END AS delta_us
FROM carried WHERE event_type = 'purchase'
""",
)
def join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(purchase_id, nearest error_id, |Δt| in microseconds) per purchase.
    Purchases with no error on either side emit NULLs.  A purchase at the
    exact instant of an error matches it with delta 0 (the 'before' carry
    includes the current row; purchase rows never populate the carry
    columns, so self-match is impossible)."""
    e = t(spark, sf_dir, "events")
    is_err = F.col("event_type") == "error"
    tagged = e.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(is_err, F.unix_micros("ts")).alias("err_us"),
        F.when(is_err, F.col("event_id")).alias("err_id"),
    )
    base = _W.partitionBy("user_id").orderBy("us", "event_id")
    wb = base.rowsBetween(_W.unboundedPreceding, 0)
    wa = base.rowsBetween(0, _W.unboundedFollowing)
    carried = tagged.select(
        "event_id",
        "event_type",
        "us",
        F.last("err_us", ignorenulls=True).over(wb).alias("before_us"),
        F.last("err_id", ignorenulls=True).over(wb).alias("before_id"),
        F.first("err_us", ignorenulls=True).over(wa).alias("after_us"),
        F.first("err_id", ignorenulls=True).over(wa).alias("after_id"),
    )
    before_d = F.col("us") - F.col("before_us")
    after_d = F.col("after_us") - F.col("us")
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.when(F.col("before_us").isNull() & F.col("after_us").isNull(), F.lit(None))
        .when(F.col("after_us").isNull(), F.col("before_id"))
        .when(F.col("before_us").isNull(), F.col("after_id"))
        .when(before_d <= after_d, F.col("before_id"))
        .otherwise(F.col("after_id"))
        .alias("error_id"),
        F.when(F.col("before_us").isNull() & F.col("after_us").isNull(), F.lit(None))
        .when(F.col("after_us").isNull(), before_d)
        .when(F.col("before_us").isNull(), after_d)
        .otherwise(F.least(before_d, after_d))
        .alias("delta_us"),
    )
