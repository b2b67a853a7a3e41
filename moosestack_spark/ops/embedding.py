"""Embedding-column transforms: PCA dimensionality reduction.

The standard pre-ANN compression step (reduce d=64 to k=16 before index
build; compose with int8 quantization from ops/similarity.py for ~16x
candidate-side memory).  Spark-first shape for 100 TB:

- TRAIN on a bounded deterministic sample (first n by id): the n x d
  matrix is a driver-side numpy SVD — same category of bounded collect as
  IVF centroids; at web scale n stays ~10^5 regardless of corpus size
  because principal axes converge long before full-data passes pay off.
- PROJECT distributed: mean + components broadcast as numpy arrays into
  an Arrow-batched kernel; each batch is one (batch x d) @ (d x k) GEMM.
  No shuffle anywhere — projection is row-local.

Determinism: the sample is id-ordered, numpy/LAPACK SVD is deterministic
for a fixed matrix, and each component's sign is normalized (first
nonzero coordinate positive) to remove the SVD sign ambiguity.  The gate
query registers rows-only (SVD is not SQL-expressible); invariants
(orthonormality, explained-variance ordering, partitioning-independence,
reconstruction error) are pytest-pinned in test_embedding_pca.py.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def train_pca(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 10000,
) -> tuple[np.ndarray, np.ndarray]:
    """Fit PCA on the first `sample_n` vectors by id.  Returns
    (mean[d], components[k, d]) with sign-normalized rows."""
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(sample_n)
        .collect()
    )
    x = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    mean = x.mean(axis=0)
    _, _, vt = np.linalg.svd(x - mean, full_matrices=False)
    comps = vt[:k]
    for i in range(comps.shape[0]):  # sign convention: first nonzero > 0
        nz = np.nonzero(comps[i])[0]
        if len(nz) and comps[i, nz[0]] < 0:
            comps[i] = -comps[i]
    return mean, comps


def project_pca(
    df: DataFrame,
    mean: np.ndarray,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, projected: array<double>) via an Arrow-batched GEMM kernel;
    mean/components ride along as task-closure broadcasts."""
    import pandas as pd

    mean_b = mean.copy()
    comps_b = components.T.copy()  # d x k

    def kernel(batches):
        for pdf in batches:
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            proj = (x - mean_b) @ comps_b if len(x) else np.zeros((0, comps_b.shape[1]))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "projected": [list(map(float, p)) for p in proj]}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} {id_type}, projected array<double>"
    )


@query("embedding_pca_project")  # SVD not SQL-expressible: rows-only check
def embedding_pca_project(spark, sf_dir: str) -> DataFrame:
    """Project the embeddings corpus 64-d -> 8-d; output id + the rounded
    first component (rounded to 6 decimals so the rows-only check is
    layout-stable)."""
    e = t(spark, sf_dir, "embeddings")
    mean, comps = train_pca(e, k=8)
    out = project_pca(e, mean, comps)
    return out.select(
        "vec_id", F.round(F.element_at("projected", 1), 6).alias("pc1")
    )


_ = embedding_pca_project
