"""top_k: the two-stage (partition-local prune -> global window) exact
heavy-hitters must equal the naive single-window form on arbitrary data and
partitionings — the prune is lossless because global winners are always
local winners under the total (count desc, value asc) order."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from moosestack_spark.operators.aggregates import top_k


def _naive(df, group_col, value_col, k):
    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("c").desc(), F.col(value_col).asc()
    )
    ranked = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    out = {}
    for r in ranked.orderBy(group_col, "rk").collect():
        out.setdefault(r[group_col], []).append(r[value_col])
    return out


def test_top_k_two_stage_equals_naive(spark):
    random.seed(11)
    rows = [(random.choice("abcd"), random.randint(0, 300)) for _ in range(15000)]
    for n_parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "g string, v int").repartition(n_parts)
        got = {r.g: r.top_values for r in top_k(df, "g", "v", 4).collect()}
        assert got == _naive(df, "g", "v", 4), f"n_parts={n_parts}"


def test_top_k_ties_and_small_groups(spark):
    # every value equally frequent -> tiebreak is value asc; group smaller
    # than k returns all its values
    rows = [("g1", v) for v in (5, 3, 9, 1)] + [("g2", 42)]
    df = spark.createDataFrame(rows, "g string, v int").repartition(8)
    got = {r.g: r.top_values for r in top_k(df, "g", "v", 3).collect()}
    assert got == {"g1": [1, 3, 5], "g2": [42]}
