"""Skew mitigation (SURVEY.md "Optimize for scale": salting for skewed keys).

A groupBy whose key distribution is heavily skewed (one key holding a large
fraction of all rows) bottlenecks on the single reducer owning the hot key.
Two-phase salted aggregation splits every hot key across `n_salts` reducers:

  phase 1: groupBy(key, salt) with salt = pmod(xxhash64(uniq row attrs), n)
           -> partial aggregates, hot key spread over n partitions
  phase 2: groupBy(key) over the n partials -> final values

Only algebraic aggregates compose across phases (count/sum/min/max; avg as
sum+count).  AQE's skew-join handling covers JOIN skew at runtime; GROUP BY
skew is already two-phase in Spark (partial_* map-side), so explicit salting
matters when the MAP side itself is key-partitioned upstream (e.g. after a
repartition(key) the partial agg no longer helps) — this operator re-spreads
regardless of upstream partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import dec, sql_dsum
from moosestack_spark.registry import query
from moosestack_spark.tables import t


def salted_agg(
    df: DataFrame,
    keys: list[str],
    salt_source: Column,
    n_salts: int = 16,
    counts: list[str] = (),
    sums: dict[str, Column] | None = None,
    maxes: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    counts -> output count columns; sums/maxes map output name -> expr.
    The salt derives from per-row attributes (not random) so the plan stays
    deterministic and re-runnable.
    """
    sums = sums or {}
    maxes = maxes or {}
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))
    p1_aggs = []
    for name in counts:
        p1_aggs.append(F.count(F.lit(1)).alias(f"__c_{name}"))
    for name, expr in sums.items():
        p1_aggs.append(F.sum(expr).alias(f"__s_{name}"))
    for name, expr in maxes.items():
        p1_aggs.append(F.max(expr).alias(f"__m_{name}"))
    partial = salted.groupBy(*keys, "__salt").agg(*p1_aggs)
    p2_aggs = []
    for name in counts:
        p2_aggs.append(F.sum(f"__c_{name}").alias(name))
    for name in sums:
        p2_aggs.append(F.sum(f"__s_{name}").alias(name))
    for name in maxes:
        p2_aggs.append(F.max(f"__m_{name}").alias(name))
    return partial.groupBy(*keys).agg(*p2_aggs)


@query(
    "agg_salted_skew",
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty,
       MAX(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_returnflag has ~3 distinct values over the whole fact table — the
    canonical hot-key shape.  Salted two-phase result must equal the plain
    group aggregate (the oracle)."""
    li = t(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        salt_source=F.col("l_orderkey"),
        n_salts=16,
        counts=["n"],
        sums={"sum_qty": dec("l_quantity")},
        maxes={"max_price": F.col("l_extendedprice")},
    )
    return out.select(
        "l_returnflag", "n", F.col("sum_qty").cast("double").alias("sum_qty"), "max_price"
    )
