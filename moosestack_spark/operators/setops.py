"""Set operations (SURVEY.md §2.7).

First-class in the reference only as the Merge engine — a UNION ALL over
tables matching a regex (py-moose-lib blocks.py:512-533) — plus raw-SQL
UNION/INTERSECT/EXCEPT passthrough.  Spark: unionByName with
allowMissingColumns for the Merge emulation; native set ops otherwise.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def merge_union(frames: list[DataFrame]) -> DataFrame:
    """Merge-engine emulation: UNION ALL by column name, filling missing
    columns with NULL (blocks.py:512-533 reads all tables matching a regex;
    schema drift across versions is tolerated)."""
    if not frames:
        raise ValueError("merge_union needs at least one frame")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


# --------------------------------------------------------------------------
# Merge-engine emulation: per-region customer slices unioned back together
# (slices have a provenance column, like versioned tables feeding a Merge).
# --------------------------------------------------------------------------


@query(
    "setop_union_merge",
    oracle="""
SELECT src, c_custkey, c_acctbal FROM (
  SELECT 'high' AS src, c_custkey, c_acctbal FROM customer WHERE c_acctbal >= 5000
  UNION ALL
  SELECT 'low' AS src, c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
)
""",
)
def setop_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    hi = c.filter(F.col("c_acctbal") >= 5000).select(
        F.lit("high").alias("src"), "c_custkey", "c_acctbal"
    )
    lo = c.filter(F.col("c_acctbal") < 0).select(
        F.lit("low").alias("src"), "c_custkey", "c_acctbal"
    )
    return merge_union([hi, lo])


# --------------------------------------------------------------------------
# INTERSECT / EXCEPT (raw-SQL passthrough surface in the reference).
# Nations that have suppliers but no customers with negative balance, etc.
# --------------------------------------------------------------------------


@query(
    "setop_intersect_except",
    oracle="""
SELECT 'both' AS kind, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT
  SELECT s_nationkey AS nationkey FROM supplier
)
UNION ALL
SELECT 'customer_only' AS kind, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  EXCEPT
  SELECT s_nationkey AS nationkey FROM supplier
)
""",
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    sn = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cn.intersect(sn).select(F.lit("both").alias("kind"), "nationkey")
    conly = cn.subtract(sn).select(F.lit("customer_only").alias("kind"), "nationkey")
    return both.unionByName(conly)


@query(
    "setop_all_variants",
    oracle="""
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
""",
)
def setop_all_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL preserves multiplicity (min of the two sides' counts) —
    DataFrame intersectAll; EXCEPT ALL is the exceptAll sibling."""
    li = t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    return a.intersectAll(r)
