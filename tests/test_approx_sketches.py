"""Approximate-op quality floors: sketches must land near their gated exact
counterparts."""

from __future__ import annotations

from moosestack_spark import registry

registry.load_all()


def test_hll_estimate_within_error_band(spark, sf_dir):
    # the gate now emits the band check itself (graduated hard oracle);
    # this pytest additionally pins the RAW estimate against the exact
    # count so the band column can't drift from the real sketch
    from pyspark.sql import functions as F

    from moosestack_spark.tables import t

    rows = registry.QUERIES["agg_uniq_approx"](spark, sf_dir).collect()
    assert rows and all(r.within_band for r in rows)
    raw = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("uniq_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .collect()
    )
    for r in raw:
        err = abs(r.uniq_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert err <= 0.05, f"{r.l_returnflag}: HLL err {err:.3f}"


def test_hash_sample_fraction_close_to_nominal(spark, sf_dir):
    from pyspark.sql import functions as F

    from moosestack_spark.tables import t

    total = t(spark, sf_dir, "orders").count()
    sampled = sum(
        r.n_sampled for r in registry.QUERIES["sample_hash_mod"](spark, sf_dir).collect()
    )
    assert 0.05 <= sampled / total <= 0.15  # ~10% nominal
    # deterministic: identical resample
    again = sum(
        r.n_sampled for r in registry.QUERIES["sample_hash_mod"](spark, sf_dir).collect()
    )
    assert again == sampled


def test_approx_percentile_within_rank_error(spark, sf_dir):
    # The native GK sketch (the accuracy tier beyond the gate's hash-sample
    # path) stays pinned here even though the gate itself graduated to the
    # deterministic rank-quantile oracle.
    from pyspark.sql import functions as F

    from moosestack_spark.tables import t

    rows = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
            ).alias("approx_pcts"),
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
            ).alias("exact_pcts"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for approx, exact in zip(r.approx_pcts, r.exact_pcts):
            # GK accuracy=10000 -> rank error 1e-4; translate to a loose
            # value band (1% relative) for the smooth price distribution
            assert abs(approx - exact) / max(abs(exact), 1e-9) <= 0.01, (
                r.l_returnflag, approx, exact
            )


def test_gate_sampled_quantile_close_to_exact(spark, sf_dir):
    # the 1-in-8 hash sample's rank quantile lands near the exact one
    rows = registry.QUERIES["agg_quantile_approx"](spark, sf_dir).collect()
    assert rows
    # band is loose because the default test SF (0.001) leaves ~50 sampled
    # rows per group — sampling error ~1/sqrt(n); exactness is the oracle
    # match's job, this only checks the sample tracks the distribution
    for r in rows:
        for q in (50, 90, 99):
            a, e = r[f"approx_p{q}_cents"], r[f"exact_p{q}_cents"]
            assert abs(a - e) / max(abs(e), 1) <= 0.30, (r.l_returnflag, q, a, e)


def test_hll_deterministic_estimate_within_band(spark, sf_dir):
    from pyspark.sql import functions as F

    from moosestack_spark.tables import t

    rows = {
        r.l_returnflag: r
        for r in registry.QUERIES["agg_hll_deterministic"](spark, sf_dir).collect()
    }
    exact = {
        r.l_returnflag: r.n
        for r in t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(rows) == set(exact)
    for flag, r in rows.items():
        # m=1024 -> 1.04/sqrt(m) ~ 3.25% standard error; linear-counting
        # regime at high load factors is noisier — allow 3 sigma
        assert abs(r.hll_estimate - exact[flag]) / exact[flag] <= 0.10, (
            flag, r.hll_estimate, exact[flag]
        )
        assert 0 < r.used_registers <= 1024


def test_hll_murmur_finalizer_avalanche_on_sequential_keys(spark):
    """The multiplicative-only hash left a 34% lattice bias on sequential
    ids (measured); pin that the fmix32 spelling stays in-band on exactly
    that adversarial input shape."""
    from moosestack_spark.operators.aggregates import _hll_sql

    n = 50_000
    spark.range(n).selectExpr(
        "'X' AS l_returnflag", "id AS l_partkey"
    ).createOrReplaceTempView("lineitem")
    try:
        est = spark.sql(_hll_sql("spark")).collect()[0].hll_estimate
        assert abs(est - n) / n <= 0.10, est
    finally:
        spark.catalog.dropTempView("lineitem")


# ---- space-saving heavy hitters (ops/sketches.py) ----


def test_space_saving_band_holds_under_any_partitioning(spark):
    """The mergeable-summaries band [est, est + sum(e_p)] must contain the
    true count under adversarial repartitioning, with prunes actually
    firing (600 distinct cold keys >> cap=16)."""
    from pyspark.sql import functions as F

    from moosestack_spark.ops.sketches import space_saving_topk

    df = (
        spark.range(0, 20000)
        .select(
            F.when(
                F.col("id") % 4 < 3,
                F.concat(F.lit("hot-"), (F.col("id") % 2).cast("string")),
            )
            .otherwise(
                F.concat(F.lit("cold-"), (F.col("id") % 600).cast("string"))
            )
            .alias("key")
        )
        .repartition(13)  # layout the summaries must be independent of
    )
    got = space_saving_topk(df, "key", k=4, top=2).collect()
    exact = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert [r["key"] for r in got] == ["hot-0", "hot-1"]
    for r in got:
        assert r["est"] <= exact[r["key"]] <= r["upper"], r


def test_space_saving_exact_when_no_prunes(spark):
    """Fewer distinct keys than the cap -> zero error budget, est == exact."""
    from pyspark.sql import functions as F

    from moosestack_spark.ops.sketches import space_saving_topk

    df = spark.range(0, 1000).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("key")
    )
    got = space_saving_topk(df, "key", k=16, top=7).collect()
    exact = {
        r["key"]: r["n"]
        for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in got:
        assert r["est"] == exact[r["key"]] == r["upper"]
