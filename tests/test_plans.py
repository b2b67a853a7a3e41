"""Physical-plan shape regression tests.

Correctness says what a query returns; these tests pin HOW it executes —
the properties that decide whether the same plan survives a 100x scale-up:

- predicate pushdown + column pruning reach the parquet scan
  (PushedFilters / ReadSchema in the formatted plan);
- dimension joins broadcast (no shuffle of the fact side);
- aggregations are two-phase (map-side partial before the exchange);
- narrow text/scan ops have NO exchange at all;
- whole-stage codegen covers the hot expressions.

A refactor that silently turns a broadcast join into a sort-merge join or
drops a pushed filter still returns the right rows at sf0.001 — only these
assertions catch it.
"""

from __future__ import annotations

import pytest

from moosestack_spark import registry

registry.load_all()


def _explain(df, mode: str) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    m = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jqe.explainString(m)


def formatted_plan(df) -> str:
    return _explain(df, "formatted")


def plan_tree(p: str) -> str:
    """Just the operator tree (formatted mode repeats each node in the
    detail section below — counting on the full text double-counts)."""
    return p.split("\n\n", 1)[0]


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    def get(name: str) -> str:
        return formatted_plan(registry.QUERIES[name](spark, sf_dir))

    return get


def test_pricing_summary_pushdown_and_partial_agg(plans):
    p = plans("agg_pricing_summary")
    # shipdate predicate reaches the parquet reader
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters", 1)[1][:300]
    # only the referenced columns are read
    read = p.split("ReadSchema", 1)[1][:400]
    assert "l_comment" not in read
    # two-phase aggregation: partial_ functions before the exchange
    assert "partial_sum" in p or "partial_count" in p
    assert p.count("HashAggregate") >= 2


def test_forecast_revenue_is_scan_only(plans):
    p = plans("analytics_forecast_revenue")
    # Q6 shape: all predicates reach the scan, one partial+final aggregate,
    # and NO join/extra exchange anywhere in the plan
    assert "PushedFilters" in p
    pushed = p.split("PushedFilters", 1)[1][:500]
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    assert "Join" not in p
    assert plan_tree(p).count("Exchange") == 1  # the single-row final agg


def test_filter_pushdown_reaches_scan(plans):
    p = plans("filter_in_between")
    assert "PushedFilters" in p
    pushed = p.split("PushedFilters", 1)[1][:400]
    assert "GreaterThanOrEqual" in pushed or "In(" in pushed or "LessThanOrEqual" in pushed


def test_star_join_broadcasts_dimensions(plans):
    p = plans("join_star_multi")
    assert "BroadcastHashJoin" in p
    # the fact table must not be sort-merge-joined against a dimension
    assert "SortMergeJoin" not in p


def test_lookup_join_broadcasts(plans):
    p = plans("join_left_lookup")
    assert "BroadcastHashJoin" in p


def test_text_ops_have_no_exchange(plans):
    # narrow per-row ops: any Exchange is a regression
    for name in ("text_token_stats", "text_fingerprint", "text_lang_id"):
        p = plans(name)
        assert "Exchange" not in p, f"{name} plan gained a shuffle"


def test_token_stats_is_codegened(spark, sf_dir):
    # simple mode marks codegen'd operators with '*'; the token-stats
    # projection must stay inside a WholeStageCodegen span
    df = registry.QUERIES["text_token_stats"](spark, sf_dir)
    assert "*(1)" in _explain(df, "simple")


def test_exact_dedup_single_shuffle(plans):
    p = plans("dedup_exact")
    # one shuffle for the groupBy (plus nothing else): union + hash agg
    assert plan_tree(p).count("Exchange") == 1
    assert "partial_min" in p or "partial_count" in p


def test_window_topk_single_shuffle(plans):
    p = plans("window_row_number_topk")
    assert plan_tree(p).count("Exchange") <= 2  # partition-by shuffle
    assert "RunningWindowFunction" in p or "Window" in p


def test_asof_join_single_shuffle(plans):
    # union + one window pass: exactly one Exchange (the by-key partition)
    p = plans("join_asof")
    assert plan_tree(p).count("Exchange") == 1
    assert "Window" in p


def test_range_join_broadcasts_interval_side(plans):
    p = plans("join_range_buckets")
    assert "BroadcastHashJoin" in p
    assert "NestedLoop" not in p  # bucketization must avoid BNLJ


def test_plan_audit_no_unexplained_flags(spark, sf_dir):
    """Every gate query's physical plan is free of scale red flags
    (cartesian products, unreviewed nested-loop or sort-merge joins) —
    scripts/plan_audit.py with its reviewed-exception list."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts", "plan_audit.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.audit(sf_dir) == 0


def test_orc_partitioned_read_prunes_partitions(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from moosestack_spark.tables import t

    orc_dir = str(tmp_path / "orders_orc")
    t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    ).write.mode("overwrite").partitionBy("o_orderstatus").orc(orc_dir)
    pruned = spark.read.orc(orc_dir).filter(F.col("o_orderstatus") == "F")
    plan = formatted_plan(pruned)
    # partition filter must be recognized as such (pruned at planning, not
    # scanned-then-filtered): the scan node advertises it in PartitionFilters
    assert "PartitionFilters" in plan
    scan_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "o_orderstatus" in scan_line


def test_dsir_weights_broadcasts_model_and_bounds_shuffles(plans):
    p = plans("corpus_dsir_weights")
    # the 1024-row log-ratio model must broadcast; data shuffles stay at
    # the bucket-count agg + totals + per-doc agg
    assert "BroadcastExchange" in p
    tree = plan_tree(p)
    assert tree.count("Exchange") - tree.count("BroadcastExchange") <= 4


def test_dup_ngram_fraction_two_shuffles_with_broadcast_df(plans):
    p = plans("text_dup_ngram_fraction")
    assert "BroadcastExchange" in p  # shingle-df table joins broadcast
    tree = plan_tree(p)
    assert tree.count("Exchange") - tree.count("BroadcastExchange") <= 2


def test_lake_delete_reads_broadcast_and_keep_pushdown(spark, tmp_path):
    """Both lake readers' delete application must stay a BROADCAST anti-
    join (delete side provably small: parquet stats for Iceberg, exact
    descriptor cardinality for Delta) and must not break predicate
    pushdown into the data scan."""
    from pyspark.sql import functions as F

    from moosestack_spark.catalog.delta_native import DeltaNativeTable
    from moosestack_spark.catalog.iceberg_native import IcebergNativeTable

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    dt = DeltaNativeTable.write(df.repartition(3), str(tmp_path / "d"))
    dt.delete_where("k % 10 = 3")
    it = IcebergNativeTable.write(df.repartition(3), str(tmp_path / "i"))
    it.delete_where("k % 10 = 3")
    for table in (dt, it):
        plan = table.read().filter(F.col("v") == 2)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:800]
        assert "SortMergeJoin" not in plan, plan[:800]
        assert "DataFilters: [isnotnull(v" in plan, plan[:800]


def test_session_gate_plan_shapes(spark, sf_dir):
    """Plan pins for the second-session operators: winnowing keeps ONE
    data exchange (window on doc reused by the aggregation; the gate's
    final orderBy adds only a range partition), the OLS and sweep gates
    stay sort-merge-free, and hard-negative mining broadcasts the query
    side."""
    import re

    from moosestack_spark import registry

    registry.load_all()

    def plan_of(name):
        return registry.QUERIES[name](spark, sf_dir)._jdf.queryExecution(
        ).executedPlan().toString()

    p = plan_of("dedup_winnowing_fingerprints")
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1, p[:600]
    assert "SortMergeJoin" not in p

    p = plan_of("agg_ols_multifeature")
    assert "SortMergeJoin" not in p
    # nine moment sums in ONE grouped aggregate: partial_ before the
    # exchange proves map-side combine
    assert "partial_" in p.lower() or "HashAggregate" in p

    p = plan_of("similarity_hard_negatives")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, p[:600]
    assert "SortMergeJoin" not in p
