"""ClickHouse SELECT-dialect extensions: LIMIT..OFFSET..BY, DISTINCT ON,
dictionary lookups (dictGet / dictGetOrDefault).

Reference parity: the moose OlapTable SQL passthrough accepts the full CH
SELECT dialect (reference packages/ts-moose-lib sql template -> ClickHouse;
SURVEY.md §2.6/§2.3).  These are the remaining SELECT-modifier shapes not
already covered by sortlimit.py / aggregates_ext.py:

- ``LIMIT n OFFSET m BY expr`` — per-group pagination (skip the first m
  rows of every group, take the next n);
- ``DISTINCT ON (cols)`` — first row per key under the ORDER BY (CH 23.x
  syntax; equivalent to LIMIT 1 BY);
- ``dictGet('dict', 'attr', key)`` — CH external dictionaries are
  in-memory key->attr maps resolved per-row.  The Spark-native equivalent
  is a broadcast hash join against the dictionary table: same per-row
  O(1) lookup, but the "dictionary" ships once per executor instead of
  living in a side service.  ``dictGetOrDefault`` becomes the left-join +
  coalesce spelling.

Scale: all three are single-window or broadcast-join shapes — the windows
partition by the group key (one shuffle, rank-filter prune); the dict join
never shuffles the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


@query(
    "sort_limit_by_offset",
    oracle="""
SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
    row_number() OVER (
      PARTITION BY c.c_mktsegment
      ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) WHERE rn > 2 AND rn <= 5
""",
)
def sort_limit_by_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``LIMIT 3 OFFSET 2 BY c_mktsegment``: per segment, skip the two
    highest-priced orders and return the next three.  Same rank-filter
    window as LIMIT BY — the offset only moves the kept rank band, so the
    bounded-rank prune (running top-(n+m) per partition) still applies."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 2) & (F.col("rn") <= 5))
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )


@query(
    "sort_distinct_on",
    oracle="""
SELECT user_id, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_str,
       event_type
FROM (
  SELECT user_id, event_id, ts, event_type,
    row_number() OVER (
      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def sort_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``SELECT DISTINCT ON (user_id) ... ORDER BY ts DESC``: each
    user's latest event (event_id desc tiebreak makes the pick total).
    Compiled as the rank-1 window — the canonical distributed "argmax row"
    without a self-join."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_str"),
            "event_type",
        )
    )


@query(
    "join_dict_get",
    oracle="""
SELECT c.c_custkey,
       COALESCE(n.n_name, 'UNKNOWN') AS nation_name,
       COALESCE(r.r_name, 'UNKNOWN') AS region_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_custkey <= 200
""",
)
def join_dict_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``dictGetOrDefault('nations', 'n_name', c_nationkey, 'UNKNOWN')``
    plus a chained region lookup (CH hierarchical dictionary): per-row
    dictionary resolution as two BROADCAST left joins — the dictionaries
    ship once per executor and the customer side never shuffles (pinned
    by the broadcast hint; nation/region are in tables.ALWAYS_BROADCAST)."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("n_name"), F.lit("UNKNOWN")).alias("nation_name"),
            F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("region_name"),
        )
    )


@query(
    "join_paste_positional",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
    row_number() OVER (ORDER BY o_orderkey) AS rn
  FROM orders WHERE o_orderkey <= 1000
),
c AS (
  SELECT c_custkey, c_acctbal,
    row_number() OVER (ORDER BY c_custkey) AS rn
  FROM customer WHERE c_custkey <= 1000
)
SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_acctbal
FROM o JOIN c ON o.rn = c.rn
""",
)
def join_paste_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH ``PASTE JOIN``: zip two result sets row-by-row in their output
    order (inner on row position; the shorter side truncates).  CH defines
    it only for deterministic per-block order, so the Spark expression
    makes the order EXPLICIT: rank each side by its own sort key with a
    row_number window, then equi-join on the rank.

    Scale note: PASTE JOIN is a single-node construct in CH; the honest
    distributed spelling is exactly this rank-join (two single-shuffle
    windows + one equi-join), or zipWithIndex on already-co-sorted
    bucketed tables when the order is the storage order."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select("o_orderkey", "o_totalprice")
    )
    c = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 1000)
        .select("c_custkey", "c_acctbal")
    )
    wo = Window.orderBy("o_orderkey")
    wc = Window.orderBy("c_custkey")
    o_r = o.withColumn("rn", F.row_number().over(wo))
    c_r = c.withColumn("rn", F.row_number().over(wc))
    return o_r.join(c_r, "rn").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_acctbal"
    )
