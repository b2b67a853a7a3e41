"""Raw-SQL analytics passthrough shapes, part 2 (SURVEY.md §2.3/§2.4).

The reference executes arbitrary analyst SQL through its consumption APIs
(ts-moose-lib/src/consumption-apis/, sql template tag) — the engine's job is
to run classic multi-join + aggregate shapes well.  joins.py carries the
TPC-H Q3/Q5 shapes; this module widens the family across the remaining
join/agg patterns the testdata schema can express (no partsupp / shipmode /
commitdate columns exist, so Q7/Q8/Q10/Q14/Q16/Q18/Q22 are adapted to the
columns that do).

Scale notes common to all of these:
- the only large-table shuffles are the final aggregations and the
  lineitem⋈orders equi-join (one shuffle each side, AQE-skew-handled);
- every dimension join (customer, supplier, nation, region, part at bench SF)
  is broadcast-eligible; nation/region are forced (fixed 25/5 rows at any SF);
- ratio results are computed as exact decimal sums surfaced as doubles with a
  single IEEE division (see operators/_determinism.py) so the DuckDB oracle
  hashes identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import davg, dsum, sql_davg, sql_dsum
from moosestack_spark.registry import query
from moosestack_spark.tables import t

# Shared revenue expression: exact decimal l_extendedprice * (1 - l_discount).
_ONE = "CAST(1 AS DECIMAL(3,2))"
_SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) "
    f"* ({_ONE} - CAST(l_discount AS DECIMAL(8,2)))"
)


def _rev() -> F.Column:
    one = F.lit(1).cast("decimal(3,2)")
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        one - F.col("l_discount").cast("decimal(8,2)")
    )


# --------------------------------------------------------------------------
# Q7 shape: bilateral trade volume between two nations by ship year.
# --------------------------------------------------------------------------


@query(
    "analytics_volume_shipping",
    oracle=f"""
SELECT
  sn.n_name AS supp_nation,
  cn.n_name AS cust_nation,
  CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
  CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(year FROM l_shipdate) AS INT)
""",
)
def analytics_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing each way between a nation pair, per
    ship year.  The nation filter lands on the *dimension* sides (supplier /
    customer shrink to ~1/25th before the fact join), so the big join inputs
    are pre-pruned — the same plan Catalyst picks at 100 TB."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------
# Q8 shape: one nation's market share inside a region's PROMO-part spend.
# --------------------------------------------------------------------------


@query(
    "analytics_market_share",
    oracle=f"""
SELECT
  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
  CAST(SUM(CASE WHEN sn.n_name = 'NATION_5' THEN {_SQL_REV}
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({_SQL_REV}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND p_type = 'PROMO'
GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS INT)
""",
)
def analytics_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_5 suppliers' share of ASIA customers' spend on
    PROMO parts, by order year.  Numerator and denominator are both exact
    decimal sums; the share is one IEEE division (deterministic vs DuckDB)."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    nation_rev = F.when(F.col("supp_nation") == "NATION_5", _rev()).otherwise(zero)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(nation_rev).cast("double") / F.sum(_rev()).cast("double")
            ).alias("mkt_share")
        )
    )


# --------------------------------------------------------------------------
# Q10 shape: top customers by returned-item revenue.
# --------------------------------------------------------------------------


@query(
    "analytics_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
  CAST(SUM({_SQL_REV}) AS DOUBLE) AS revenue,
  CAST(c_acctbal AS DOUBLE) AS acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def analytics_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a half
    year, top 20.  Date predicate pushes into the orders scan; the top-20 is
    a TakeOrderedAndProject (no global sort materialization)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q14 shape: promo revenue percentage by ship month.
# --------------------------------------------------------------------------


@query(
    "analytics_promo_revenue",
    oracle=f"""
SELECT
  strftime(DATE_TRUNC('month', l_shipdate), '%Y-%m') AS ship_month,
  CAST(100 AS DOUBLE)
    * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_REV}
               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(SUM({_SQL_REV}) AS DOUBLE) AS promo_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY DATE_TRUNC('month', l_shipdate)
""",
)
def analytics_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percent of each month's revenue from PROMO parts.
    100 * x / y on exact-decimal-summed doubles: the multiply by the exact
    double 100 then one division — both engines agree bit-for-bit."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(18,2)")
    promo_rev = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_format(F.date_trunc("month", "l_shipdate"), "yyyy-MM").alias("ship_month"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo_rev).cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("promo_pct")
        )
    )


# --------------------------------------------------------------------------
# Q18 shape: large-volume orders (HAVING over a fact-side rollup, then
# enrich with the customer dimension).
# --------------------------------------------------------------------------


@query(
    "analytics_large_orders",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  CAST(o_totalprice AS DOUBLE) AS totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
ORDER BY totalprice DESC, o_orderkey
LIMIT 100
""",
)
def analytics_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds 150.  The rollup
    happens on (orderkey) BEFORE joining customer, so the HAVING filter
    shrinks the join input from |orders| to the handful of giants — at 100 TB
    that ordering is the difference between joining 1e10 and 1e4 rows."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier variety per part brand/type (COUNT DISTINCT across a
# fact-derived bridge, standing in for the absent partsupp table).
# --------------------------------------------------------------------------


@query(
    "analytics_supplier_variety",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 50
""",
)
def analytics_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers ship each brand/type/size
    (lineitem stands in for partsupp).  COUNT DISTINCT expands to a two-level
    aggregate — partial per-partition dedup before the exchange, so the
    shuffle carries distinct (group, suppkey) pairs, not raw lineitems."""
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(50)
    )


# --------------------------------------------------------------------------
# Q22 shape: well-funded customers who never ordered, by nation.
# --------------------------------------------------------------------------


@query(
    "analytics_idle_customers",
    oracle=f"""
WITH threshold AS (
  SELECT {sql_davg('c_acctbal')} AS avg_bal FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey AS nationkey, COUNT(*) AS n_custs,
  {sql_dsum('c_acctbal')} AS total_bal
FROM customer, threshold
WHERE c_acctbal > threshold.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
""",
)
def analytics_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and zero orders.
    The average is an exact decimal sum / count (deterministic vs DuckDB);
    the no-orders test is a LEFT ANTI join on the order keys — at scale the
    anti join shuffles only the distinct custkey projection of orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    rich = c.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


# --------------------------------------------------------------------------
# Q6 shape: forecast revenue change — the canonical scan-only aggregate.
# Completes the full TPC-H 1-22 shape coverage (Q1 aggregates.py, Q3/Q5
# joins.py, the rest here + analytics3.py).
# --------------------------------------------------------------------------


@query(
    "analytics_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(8,2))) AS DOUBLE) AS lost_revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def analytics_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would be gained by eliminating small
    discounts — a pure scan + filter + global aggregate, ZERO joins.  The
    plan test to care about: all three predicates reach the parquet scan
    (PushedFilters) so only matching row groups are read; the aggregate is
    partial+final with no other exchange.  Exact decimal product keeps the
    sum hash-identical to DuckDB."""
    li = t(spark, sf_dir, "lineitem")
    lost = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(8,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(lost).cast("double").alias("lost_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
