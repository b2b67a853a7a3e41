"""Projection / filter / predicate operators (SURVEY.md §2.2).

Mirrors the reference's predicate vocabulary:
- py query_builder predicates eq ne lt le gt ge in_ is_null
  (packages/py-moose-lib/moose_lib/query_builder.py:55-108)
- TS filter ops eq ne gt gte lt lte like ilike in notIn between
  isNull isNotNull, with skip-on-undefined and empty-in => 1=0
  (packages/ts-moose-lib/src/query-layer/sql-utils.ts:55-185)

Every query here is a scan + filter + project — Catalyst pushes the
predicates and the projection into the parquet scan, so at 100 TB these read
only the row groups and columns they need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.query_layer.filter_ops import compile_filters
from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# Comparison operators on lineitem (eq/ne/lt/le/gt/ge combined with and/or).
# --------------------------------------------------------------------------


@query(
    "filter_comparisons",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE l_quantity >= 30 AND l_quantity <= 40
  AND l_discount > 0.02 AND l_discount < 0.08
  AND l_returnflag <> 'N'
  AND l_linenumber = 1
""",
)
def filter_comparisons(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_quantity") <= 40)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_discount") < 0.08)
        & (F.col("l_returnflag") != "N")
        & (F.col("l_linenumber") == 1)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


# --------------------------------------------------------------------------
# in / notIn / between  (sql-utils.ts:96-142)
# --------------------------------------------------------------------------


@query(
    "filter_in_between",
    oracle="""
SELECT l_orderkey, l_returnflag, l_shipdate
FROM lineitem
WHERE l_returnflag IN ('A', 'R')
  AND l_linestatus NOT IN ('O')
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
""",
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & ~F.col("l_linestatus").isin("O")
        & F.col("l_shipdate").between(
            F.lit("1996-01-01 00:00:00").cast("timestamp"),
            F.lit("1996-12-31 00:00:00").cast("timestamp"),
        )
    ).select("l_orderkey", "l_returnflag", "l_shipdate")


# --------------------------------------------------------------------------
# like / ilike on part names  (sql-utils.ts:106-112)
# --------------------------------------------------------------------------


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%gold%'
   OR p_type ILIKE '%BRASS%'
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_name").like("%gold%") | F.col("p_type").ilike("%BRASS%")).select(
        "p_partkey", "p_name", "p_type"
    )


# --------------------------------------------------------------------------
# isNull / isNotNull over a nullable derivation (nullif).
# --------------------------------------------------------------------------


@query(
    "filter_null_checks",
    oracle="""
SELECT o_orderkey, NULLIF(o_orderstatus, 'O') AS closed_status
FROM orders
WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
""",
)
def filter_null_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    closed = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select("o_orderkey", closed.alias("closed_status")).filter(
        closed.isNotNull()
    )


# --------------------------------------------------------------------------
# The TS filter-compiler semantics, driven through our query_layer
# implementation: skip-on-undefined (None value drops the clause), empty
# `in` list => FALSE (1=0), empty `notIn` => TRUE (1=1)
# (sql-utils.ts:96-142,155-185).
# --------------------------------------------------------------------------


@query(
    "filter_semantics_skip_and_empty_in",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
WHERE c_acctbal > 1000
""",
)
def filter_semantics_skip_and_empty_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    # undefined (None) value => clause skipped; empty notIn => always-true.
    cond = compile_filters(
        [
            ("c_acctbal", "gt", 1000),
            ("c_mktsegment", "eq", None),  # skipped
            ("c_name", "like", None),  # skipped
            ("c_mktsegment", "notIn", []),  # 1 = 1
        ]
    )
    return c.filter(cond).select("c_custkey", "c_mktsegment", "c_acctbal")


@query(
    "filter_empty_in_is_false",
    oracle="SELECT c_custkey, c_name FROM customer WHERE 1 = 0",
)
def filter_empty_in_is_false(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    cond = compile_filters([("c_mktsegment", "in", [])])  # 1 = 0
    return c.filter(cond).select("c_custkey", "c_name")
