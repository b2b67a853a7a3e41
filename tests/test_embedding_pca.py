"""PCA invariants: orthonormal components, explained-variance ordering,
partitioning-independent projection, reconstruction improving with k."""

from __future__ import annotations

import numpy as np
import pytest

from moosestack_spark.ops.embedding import project_pca, train_pca


def _toy(spark, n_parts):
    rng = np.random.default_rng(123)
    # anisotropic cloud: variance concentrated in a few directions
    basis = rng.normal(size=(6, 16))
    coords = rng.normal(size=(300, 6)) * np.array([10, 6, 3, 1, 0.5, 0.2])
    x = coords @ basis + rng.normal(scale=0.01, size=(300, 16))
    rows = [(i, [float(v) for v in x[i]]) for i in range(300)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .repartition(n_parts),
        x,
    )


def test_components_orthonormal_and_ordered(spark):
    df, x = _toy(spark, 4)
    mean, comps = train_pca(df, k=5, sample_n=300)
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-8)
    centered = x - x.mean(axis=0)
    var = [(centered @ c).var() for c in comps]
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(4))  # ordered


def test_projection_partitioning_independent(spark):
    df1, _ = _toy(spark, 1)
    df7, _ = _toy(spark, 7)
    mean, comps = train_pca(df1, k=4, sample_n=300)
    p1 = {r.vec_id: r.projected for r in project_pca(df1, mean, comps).collect()}
    p7 = {r.vec_id: r.projected for r in project_pca(df7, mean, comps).collect()}
    assert p1.keys() == p7.keys()
    for k in p1:
        assert np.allclose(p1[k], p7[k])


def test_reconstruction_error_shrinks_with_k(spark):
    df, x = _toy(spark, 3)
    errs = []
    for k in (1, 3, 6):
        mean, comps = train_pca(df, k=k, sample_n=300)
        centered = x - mean
        recon = centered @ comps.T @ comps
        errs.append(float(((centered - recon) ** 2).mean()))
    assert errs[0] > errs[1] > errs[2]
    assert errs[2] < 0.01 * errs[0]  # 6 comps capture the 6-dim structure


def test_integer_pc1_agrees_with_svd(spark, sf_dir):
    """The graduated integer gate path must point where LAPACK points:
    cosine between the power-iteration direction and the SVD's first
    component >= 0.99 on the test corpus (sign-conventions aligned)."""
    import numpy as np

    from moosestack_spark.ops.embedding import (
        gram_int,
        power_iter_pc1_int,
        train_pca,
    )
    from moosestack_spark.tables import t

    e = t(spark, sf_dir, "embeddings")
    n, S, G = gram_int(e)
    v, sign = power_iter_pc1_int(n, S, G)
    vi = sign * np.array(v, dtype=np.float64)
    _, comps = train_pca(e, k=1)
    pc1 = comps[0]
    cos = abs(vi @ pc1) / (np.linalg.norm(vi) * np.linalg.norm(pc1))
    assert cos >= 0.99, cos


def test_pc1_scores_cap_refused(spark):
    from moosestack_spark.ops.embedding import pca_pc1_scores_int

    df = spark.createDataFrame(
        [(0, [0.1, 0.2])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="int64-exact bound"):
        pca_pc1_scores_int(df, n=60_000_000, S=[0, 0], v=[1, 1], sign=1)
