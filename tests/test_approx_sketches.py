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
