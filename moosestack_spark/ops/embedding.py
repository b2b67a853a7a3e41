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


# --------------------------------------------------------------------------
# Integer-exact first principal component (the gate path): deterministic
# power iteration on the EXACT centered Gram matrix of floor(x * 2^15)
# quantized vectors — every step is integer arithmetic both engines
# reproduce bit-for-bit (the kmeans_int discipline, ops/clustering.py), so
# the gate graduates from rows-only to a hard DuckDB oracle.  The float
# SVD path above stays the production API; pytest pins the two paths'
# agreement (cosine of directions) on the test corpus.
#
# Arithmetic bounds (d=64, QS=2^15, |x| < 1 so |q| <= QS):
# - distributed sums (Spark int64): Gram G_ab = sum q_a q_b <= n*2^30;
#   projection n*dot(q, v) <= n*2^36 — both exact for n <= ~5*10^7, and
#   the train step refuses loudly beyond that (production SVD has no cap).
# - driver iteration (Python ints, arbitrary precision) and the oracle
#   (DuckDB HUGEINT, 127 bits): M = n*G - S S^T <= 2 n^2 2^30 and the
#   iterate products stay < 2^120 at the cap.
# - normalization each step: v <- trunc(w * QS / max|w|) — TRUNCATING
#   division toward zero, matching DuckDB's `//` (Python's // floors, so
#   _tdiv spells out truncation).
# --------------------------------------------------------------------------

PCA_QS = 1 << 15
PCA_ITERS = 60
_PCA_N_CAP = 50_000_000


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) — DuckDB's ``//``."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def gram_int(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qscale: int = PCA_QS,
) -> tuple[int, list[int], list[list[int]]]:
    """(n, S[d], G[d][d]) — exact integer count, column sums, and Gram of
    the quantized corpus.  One scan: an Arrow kernel emits per-batch
    partial (a, b, sum q_a q_b) cells plus sentinel rows for S (b = -1)
    and n (a = b = -1); one 4096-cell shuffle reduces them.  The batch
    GEMM is int64 (numpy matmul on int64 is exact) and every partial is
    far inside int64 by the bounds above."""
    import pandas as pd

    q = df.selectExpr(
        f"transform({vec_col}, x -> cast(floor(cast(x as double) * "
        f"{qscale}) as bigint)) AS q"
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([list(v) for v in pdf["q"]], dtype=np.int64)
            G = X.T @ X
            S = X.sum(axis=0)
            d = X.shape[1]
            a_idx, b_idx = np.meshgrid(
                np.arange(d), np.arange(d), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "a": np.concatenate(
                        [a_idx.ravel(), np.arange(d), [-1]]
                    ),
                    "b": np.concatenate(
                        [b_idx.ravel(), np.full(d, -1), [-1]]
                    ),
                    "p": np.concatenate([G.ravel(), S, [len(X)]]),
                }
            )

    cells = (
        q.mapInPandas(kernel, "a int, b int, p long")
        .groupBy("a", "b")
        .agg(F.sum("p").alias("p"))
        .collect()
    )
    n = 0
    S: dict[int, int] = {}
    G: dict[tuple[int, int], int] = {}
    for r in cells:
        if r.a == -1:
            n = int(r.p)
        elif r.b == -1:
            S[r.a] = int(r.p)
        else:
            G[(r.a, r.b)] = int(r.p)
    d = len(S)
    return (
        n,
        [S[j] for j in range(d)],
        [[G[(a, b)] for b in range(d)] for a in range(d)],
    )


def power_iter_pc1_int(
    n: int,
    S: list[int],
    G: list[list[int]],
    qscale: int = PCA_QS,
    iters: int = PCA_ITERS,
) -> tuple[list[int], int]:
    """(v[d], sign): `iters` exact-integer power-iteration rounds on the
    scaled centered Gram M = n*G - S S^T, starting from all-ones, each
    round renormalized to [-qscale, qscale] by truncating division.
    sign is the first-nonzero-positive convention (same as train_pca)."""
    d = len(S)
    M = [
        [n * G[a][b] - S[a] * S[b] for b in range(d)] for a in range(d)
    ]
    v = [1] * d
    for _ in range(iters):
        w = [sum(M[a][b] * v[b] for b in range(d)) for a in range(d)]
        mx = max(abs(x) for x in w)
        if mx == 0:
            v = [0] * d
            break
        v = [_tdiv(x * qscale, mx) for x in w]
    sign = 1
    for x in v:
        if x != 0:
            sign = 1 if x > 0 else -1
            break
    return v, sign


def pca_pc1_scores_int(
    df: DataFrame,
    n: int,
    S: list[int],
    v: list[int],
    sign: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    qscale: int = PCA_QS,
) -> DataFrame:
    """(id, pc1_int): the exact integer projection of each CENTERED
    quantized row onto v, scaled by n to avoid division:
    pc1 = sign * (n * dot(q, v) - dot(S, v)) — one JVM fold expression,
    no shuffle, no Python in the hot path."""
    if n > _PCA_N_CAP:
        raise ValueError(
            f"pca_pc1_scores_int: n={n} exceeds the int64-exact bound "
            f"({_PCA_N_CAP}); use the float SVD path (train_pca/"
            "project_pca) at this scale"
        )
    c0 = sum(S[j] * v[j] for j in range(len(v)))
    v_lits = ", ".join(str(int(x)) + "L" for x in v)
    dot = (
        f"aggregate(zip_with(transform({vec_col}, x -> "
        f"cast(floor(cast(x as double) * {qscale}) as bigint)), "
        f"array({v_lits}), (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
    )
    return df.selectExpr(
        id_col,
        f"cast({sign}L * ({n}L * {dot} - {c0}L) as bigint) AS pc1_int",
    )


def _pca_pc1_oracle(
    qscale: int = PCA_QS, iters: int = PCA_ITERS, dim: int = 64
) -> str:
    """DuckDB replay of the full integer pipeline: quantize, exact Gram +
    sums, `iters` unrolled power-iteration rounds (HUGEINT; `//` is the
    same truncating division), first-nonzero sign, exact projection."""
    it_ctes = []
    prev = "v0"
    for i in range(1, iters + 1):
        it_ctes.append(
            f"w{i} AS MATERIALIZED (SELECT m.ja AS j, SUM(m.m * p.v) AS w\n"
            f"         FROM m JOIN {prev} p ON p.j = m.jb GROUP BY m.ja),\n"
            f"mx{i} AS MATERIALIZED (SELECT MAX(ABS(w)) AS mx FROM w{i}),\n"
            f"v{i} AS MATERIALIZED (SELECT j, CASE WHEN (SELECT mx FROM mx{i}) = 0\n"
            f"                        THEN CAST(0 AS HUGEINT)\n"
            f"                        ELSE (w * {qscale}) // (SELECT mx FROM mx{i})\n"
            f"                   END AS v FROM w{i})"
        )
        prev = f"v{i}"
    its_sql = ",\n".join(it_ctes)
    return f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS j,
         CAST(FLOOR(CAST(UNNEST(embedding) AS DOUBLE) * {qscale}) AS BIGINT) AS q
  FROM embeddings
),
nn AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
s AS (SELECT j, CAST(SUM(q) AS HUGEINT) AS s FROM qv GROUP BY j),
g AS MATERIALIZED (SELECT a.j AS ja, b.j AS jb, SUM(CAST(a.q AS HUGEINT) * b.q) AS g
      FROM qv a JOIN qv b USING (vec_id) GROUP BY a.j, b.j),
m AS MATERIALIZED (SELECT g.ja, g.jb, (SELECT n FROM nn) * g.g - sa.s * sb.s AS m
      FROM g JOIN s sa ON sa.j = g.ja JOIN s sb ON sb.j = g.jb),
v0 AS (SELECT j, CAST(1 AS HUGEINT) AS v FROM s),
{its_sql},
sgn AS (SELECT COALESCE((SELECT CASE WHEN v < 0 THEN -1 ELSE 1 END
                         FROM v{iters} WHERE v <> 0
                         ORDER BY j LIMIT 1), 1) AS sg),
c0 AS (SELECT SUM(s.s * p.v) AS c FROM s JOIN v{iters} p ON p.j = s.j),
dots AS (SELECT qv.vec_id, SUM(CAST(qv.q AS HUGEINT) * p.v) AS d
         FROM qv JOIN v{iters} p ON p.j = qv.j GROUP BY qv.vec_id)
SELECT vec_id,
       CAST((SELECT sg FROM sgn)
            * ((SELECT n FROM nn) * d - (SELECT c FROM c0)) AS BIGINT)
         AS pc1_int
FROM dots
"""


@query("embedding_pca_project", oracle=_pca_pc1_oracle())
def embedding_pca_project(spark, sf_dir: str) -> DataFrame:
    """First principal component of the embeddings corpus, integer-exact
    (graduated from rows-only in round 10): quantized Gram + {PCA_ITERS}
    power-iteration rounds, exact centered projection, hash-matched
    against the full relational replay.  The float SVD path
    (train_pca/project_pca) is the production API; their directional
    agreement is pytest-pinned."""
    e = t(spark, sf_dir, "embeddings")
    n, S, G = gram_int(e)
    v, sign = power_iter_pc1_int(n, S, G)
    return pca_pc1_scores_int(e, n, S, v, sign)


_ = embedding_pca_project
