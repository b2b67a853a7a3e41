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
