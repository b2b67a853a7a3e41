"""Connected-components kernel: transitive chains, multiple clusters,
convergence beyond diameter-1 graphs (the things the Jaccard-pair gate
query can't isolate)."""

from __future__ import annotations

from moosestack_spark.ops.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = connected_components(df).collect()
    return {r["v"]: r["cluster_id"] for r in rows}


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4, needs multiple propagation rounds
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_clusters_keep_separate_labels(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_cycle_and_cross_edges(spark):
    # cycle 1-2-3-1 plus a bridge 3-7 into a second clique 7-8-9
    edges = [(1, 2), (2, 3), (3, 1), (3, 7), (7, 8), (8, 9), (9, 7)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 6
