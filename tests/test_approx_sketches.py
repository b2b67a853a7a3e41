"""Approximate-op quality floors: sketches must land near their gated exact
counterparts."""

from __future__ import annotations

from moosestack_spark import registry

registry.load_all()


def test_hll_estimate_within_error_band(spark, sf_dir):
    rows = registry.QUERIES["agg_uniq_approx"](spark, sf_dir).collect()
    assert rows
    for r in rows:
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
    rows = registry.QUERIES["agg_quantile_approx"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in zip(r.approx_pcts, r.exact_pcts):
            # GK accuracy=10000 -> rank error 1e-4; translate to a loose
            # value band (1% relative) for the smooth price distribution
            assert abs(approx - exact) / max(abs(exact), 1e-9) <= 0.01, (
                r.l_returnflag, approx, exact
            )
    # deterministic across reruns (same data, same sketch parameters)
    again = registry.QUERIES["agg_quantile_approx"](spark, sf_dir).collect()
    assert sorted(map(str, again)) == sorted(map(str, rows))


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
