"""NSW-style graph search: recall pin vs exact brute force, beam dial
monotonicity, and walk invariants.

The gate (similarity_graph_search) proves cross-engine determinism; these
tests prove the operator SEARCHES — on a clustered corpus the walk must
actually reach each query's true neighborhood from hash-seeded entries.
"""

from __future__ import annotations

import numpy as np
import pytest

from moosestack_spark.ops.similarity import (
    brute_force_topk,
    graph_search_topk,
)

DIM = 16
K = 5


@pytest.fixture(scope="module")
def clustered(spark):
    """300 vectors in 10 well-separated clusters (deterministic seed):
    cluster centers from a fixed RNG, members = center + small noise."""
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(10, DIM)) * 5.0
    rows = []
    for i in range(300):
        c = i % 10
        v = centers[c] + rng.normal(size=DIM) * 0.3
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall(spark, clustered, beam: int, hops: int = 3) -> float:
    qs = clustered.filter("vec_id < 10").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    cs = clustered.selectExpr("vec_id AS c_id", "embedding")
    truth = {
        (r.q_id, r.c_id)
        for r in brute_force_topk(qs, cs, k=K).collect()
    }
    found = {
        (r.q_id, r.c_id)
        for r in graph_search_topk(
            qs, cs, dim=DIM, graph_k=5, n_planes=4, n_bands=2,
            n_entry=4, beam=beam, hops=hops, k=K,
        ).collect()
    }
    return len(truth & found) / len(truth)


def test_recall_pin(spark, clustered):
    """The headline claim: the walk finds most true top-5 neighbors."""
    assert _recall(spark, clustered, beam=8) >= 0.6


def test_beam_widens_recall(spark, clustered):
    """beam is the recall dial (HNSW's ef): wider never hurts, and the
    wide setting must reach high recall on a clustered corpus."""
    r4 = _recall(spark, clustered, beam=4)
    r16 = _recall(spark, clustered, beam=16)
    assert r16 >= r4
    assert r16 >= 0.8


def test_more_hops_monotone(spark, clustered):
    """Frontier refinement is monotone: the frontier always remains a
    candidate at the next hop, so extra hops never lose a neighbor."""
    r1 = _recall(spark, clustered, beam=8, hops=1)
    r3 = _recall(spark, clustered, beam=8, hops=3)
    assert r3 >= r1


def test_output_shape(spark, clustered):
    qs = clustered.filter("vec_id < 3").selectExpr(
        "vec_id AS q_id", "embedding"
    )
    cs = clustered.selectExpr("vec_id AS c_id", "embedding")
    out = graph_search_topk(
        qs, cs, dim=DIM, graph_k=5, n_planes=4, n_bands=2,
        n_entry=4, beam=8, hops=2, k=K,
    ).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert r.c_id != r.q_id, "self must never be returned"
        by_q.setdefault(r.q_id, []).append(r.rnk)
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= K


def test_max_queries_cap(spark, clustered):
    qs = clustered.selectExpr("vec_id AS q_id", "embedding")
    cs = clustered.selectExpr("vec_id AS c_id", "embedding")
    with pytest.raises(ValueError, match="max_queries"):
        graph_search_topk(qs, cs, dim=DIM, max_queries=10)
