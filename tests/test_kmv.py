"""KMV sketch quality floors: estimates near truth, exact below k,
bounded state, merge-consistency of the set-operation path."""

from __future__ import annotations

from pyspark.sql import functions as F

from moosestack_spark.ops.sketches import (
    HASH_SPACE,
    kmv_estimate,
    kmv_set_ops,
    kmv_sketch,
)


def test_exact_below_k(spark):
    df = spark.range(40).selectExpr("'g' AS g", "id AS key")
    est = kmv_estimate(kmv_sketch(df, "g", "key", k=64), k=64).collect()[0]
    assert est.n_kept == 40
    assert est.est_distinct == 40.0  # sketch IS the set below k


def test_estimate_within_band_above_k(spark):
    n = 5000
    df = spark.range(n).selectExpr("'g' AS g", "id AS key")
    est = kmv_estimate(kmv_sketch(df, "g", "key", k=256), k=256).collect()[0]
    assert est.n_kept == 256  # state bounded by k
    rel_err = abs(est.est_distinct - n) / n
    assert rel_err < 0.2, rel_err  # ~1/sqrt(k-1) ≈ 6% expected, 20% hard cap


def test_duplicates_do_not_inflate(spark):
    base = spark.range(500).selectExpr("'g' AS g", "id AS key")
    dup = base.union(base).union(base)  # 3x multiplicity, same distincts
    e1 = kmv_estimate(kmv_sketch(base, "g", "key", k=128), k=128).collect()[0]
    e3 = kmv_estimate(kmv_sketch(dup, "g", "key", k=128), k=128).collect()[0]
    assert e1.est_distinct == e3.est_distinct
    assert e1.kmins == e3.kmins  # identical sketch, not merely close


def test_set_ops_recover_known_overlap(spark):
    n = 3000
    a = spark.range(0, n, 2).selectExpr("'a' AS g", "id AS key")  # evens
    b = spark.range(0, n, 3).selectExpr("'b' AS g", "id AS key")  # threes
    sk = kmv_sketch(a.unionByName(b), "g", "key", k=256)
    row = kmv_set_ops(sk, "g", "a", "b", k=256).collect()[0]
    true_union = n // 2 + n // 3 - n // 6
    true_jaccard = (n // 6) / true_union
    assert abs(row.union_est - true_union) / true_union < 0.2
    assert abs(row.jaccard_est - true_jaccard) / true_jaccard < 0.35
    assert abs(row.inter_est - n // 6) / (n // 6) < 0.45


def test_sketch_merge_is_order_free(spark):
    """Sketching A∪B directly equals merging the two k-min arrays — the
    associativity that makes the sketch safe for partial aggregation."""
    a = spark.range(0, 2000, 2).selectExpr("'x' AS g", "id AS key")
    b = spark.range(0, 2000, 3).selectExpr("'x' AS g", "id AS key")
    k = 128
    direct = kmv_sketch(a.unionByName(b), "g", "key", k=k).collect()[0].kmins
    sk_a = kmv_sketch(a, "g", "key", k=k).collect()[0].kmins
    sk_b = kmv_sketch(b, "g", "key", k=k).collect()[0].kmins
    merged = sorted(set(sk_a) | set(sk_b))[:k]
    assert merged == direct


def test_mincount_bucketized_estimator_band(spark):
    """The streaming-compatible bucketized variant: K bucket minima +
    MinCount finalize must land near truth across the small/large regimes
    (linear counting vs harmonic estimator)."""
    from moosestack_spark.ops.sketches import kmv_bucket_minima, mincount_finalize

    for n, tol in [(100, 0.25), (5000, 0.25), (50000, 0.25)]:
        df = spark.range(n).selectExpr("'g' AS g", "id AS key")
        minima = kmv_bucket_minima(df, "g", "key", k=256)
        assert minima.count() <= 256  # state bound
        est = mincount_finalize(minima, ["g"], k=256).collect()[0]
        assert abs(est.est_distinct - n) / n < tol, (n, est.est_distinct)
