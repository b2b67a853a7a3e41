"""IVF ANN quality invariants:

- trained (spherical-KMeans) centroids reach a recall floor at nprobe 4/16;
- probing ALL cells recovers exact brute-force results (recall 1.0) — the
  candidate-generation step loses nothing, only the probe budget does;
- recall is monotone non-decreasing in nprobe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from moosestack_spark.ops.similarity import (
    brute_force_topk,
    ivf_topk,
    ivf_train_centroids,
)
from moosestack_spark.tables import t


def _recall(ann_df, exact_df, k):
    ann = {(r.q_id, r.c_id) for r in ann_df.collect()}
    exact = {(r.q_id, r.c_id) for r in exact_df.filter(F.col("rnk") <= k).collect()}
    return len(ann & exact) / len(exact)


def test_trained_centroid_ivf_invariants(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 8).select(F.col("vec_id").alias("q_id"), "embedding")
    cs = e.select(F.col("vec_id").alias("c_id"), "embedding")
    exact = brute_force_topk(qs, cs, k=5).filter(F.col("c_id") != F.col("q_id"))

    cent = ivf_train_centroids(cs, k=16)
    assert len(cent) == 16 and all(len(c) == 64 for _, c in cent)

    recalls = {}
    for nprobe in (2, 4, 16):
        ann = ivf_topk(qs, cs, n_cells=16, nprobe=nprobe, k=5, centroids=cent)
        recalls[nprobe] = _recall(ann, exact, 5)

    assert recalls[4] >= 0.4          # useful at a 4/16 probe budget
    assert recalls[16] == 1.0         # all cells probed == exact
    assert recalls[2] <= recalls[4] <= recalls[16]  # monotone in budget
