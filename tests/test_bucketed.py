"""Bucketed co-located joins: results match the plain join, and the plan
has NO exchange when both sides share key + bucket count."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from moosestack_spark.operators.bucketed import (
    ensure_bucket_db,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    from moosestack_spark.tables import t

    db = ensure_bucket_db(spark, "bucket_test")
    write_bucketed(t(spark, SF, "orders"), f"{db}.o8", "o_custkey", 8)
    write_bucketed(t(spark, SF, "customer"), f"{db}.c8", "c_custkey", 8)
    write_bucketed(t(spark, SF, "customer"), f"{db}.c4", "c_custkey", 4)
    yield db
    for tbl in ("o8", "c8", "c4"):
        spark.sql(f"DROP TABLE IF EXISTS {db}.{tbl}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_same_bucket_join_has_no_exchange(spark, bucketed_pair):
    db = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o, c = spark.table(f"{db}.o8"), spark.table(f"{db}.c8")
        j = o.join(c, o.o_custkey == c.c_custkey).groupBy("c_nationkey").count()
        j.collect()
        plan = _plan(j)
        # the join itself reads bucketed scans: the ONLY exchange allowed is
        # the final groupBy's — no exchange on either join key may exist
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        # mismatched bucket counts DO shuffle the smaller side
        c4 = spark.table(f"{db}.c4")
        j2 = o.join(c4, o.o_custkey == c4.c_custkey).groupBy("c_nationkey").count()
        j2.collect()
        assert "Exchange hashpartitioning(c_custkey" in _plan(j2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    from moosestack_spark.tables import t

    db = bucketed_pair
    o, c = spark.table(f"{db}.o8"), spark.table(f"{db}.c8")
    got = {
        r.c_nationkey: r.n
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    po, pc = t(spark, SF, "orders"), t(spark, SF, "customer")
    want = {
        r.c_nationkey: r.n
        for r in po.join(pc, po.o_custkey == pc.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
