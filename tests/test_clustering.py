"""Clustering kernels: integer-exact k-means invariants, sign projection
bounds, label-propagation semantics on hand-built graphs (things the
embeddings-table gates can't isolate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from moosestack_spark.ops.clustering import (
    N_PROJ,
    QSCALE,
    _rp_signs,
    kmeans_int,
    random_project_int,
)
from moosestack_spark.ops.graph import label_propagation


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_kmeans_separable_clusters_and_determinism(spark):
    # two tight blobs around +0.9 and -0.9 on alternating axes
    vecs = []
    for i in range(12):
        base = 0.9 if i % 2 == 0 else -0.9
        vecs.append([base + 0.001 * i, base, base, base])
    df = _emb_df(spark, vecs)
    a1 = {r.vec_id: r.cluster_id for r in kmeans_int(df, k=2, iterations=3).collect()}
    a2 = {r.vec_id: r.cluster_id for r in kmeans_int(df, k=2, iterations=3).collect()}
    assert a1 == a2  # deterministic end-to-end
    evens = {a1[i] for i in range(0, 12, 2)}
    odds = {a1[i] for i in range(1, 12, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
    assert set(a1) == set(range(12))  # every vector assigned exactly once


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 but only two distinct point locations: one centroid never wins a
    # point after the first update; the run must still converge and assign
    # every point (empty cluster keeps its previous centroid)
    vecs = [[1.0, 1.0]] * 4 + [[-1.0, -1.0]] * 4
    df = _emb_df(spark, vecs)
    got = kmeans_int(df, k=3, iterations=2).collect()
    assert len(got) == 8
    assert all(0 <= r.cluster_id < 3 for r in got)


def test_random_projection_bounds_and_signs(spark):
    vecs = [[0.5] * 8, [-0.25] * 8]
    df = random_project_int(_emb_df(spark, vecs), n_planes=4, dim=8)
    rows = {r.vec_id: r.proj for r in df.collect()}
    assert len(rows[0]) == 4
    bound = 8 * QSCALE
    for proj in rows.values():
        assert all(abs(p) <= bound for p in proj)
    # linearity of the sign projection: x and -x/2 project oppositely-signed
    q0, q1 = rows[0], rows[1]
    for a, b in zip(q0, q1):
        assert (a == 0 and b == 0) or a * b <= 0


def test_rp_sign_matrix_is_balanced():
    rows = _rp_signs(N_PROJ, 64)
    assert all(abs(sum(r)) <= 16 for r in rows)  # measured max imbalance 14/64
    # planes pairwise-distinct (the degenerate closed-form parity hash
    # this replaced produced duplicated planes)
    assert len({tuple(r) for r in rows}) == N_PROJ


def _lpa(spark, edges, iterations=2):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.v: r.lbl for r in label_propagation(df, iterations=iterations).collect()
    }


def test_lpa_two_cliques_with_bridge(spark):
    # two triangles joined by one bridge edge: with the self-vote each
    # triangle converges to its own min label in 2 rounds and the bridge
    # endpoints stay with their triangle majority (one shared neighbor
    # plus self can't outvote two clique neighbors)
    edges = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4)]
    got = _lpa(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4}


def test_lpa_tie_breaks_to_min_label(spark):
    # vertex 3 sees labels {1, 2} with equal counts -> adopts 1
    got = _lpa(spark, [(1, 3), (2, 3)], iterations=1)
    assert got[3] == 1


def test_lpa_drops_self_loops_and_merges_two_cycle(spark):
    got = _lpa(spark, [(7, 7), (8, 9)])
    # 7's only edge is a self-loop -> vertex not in the induced graph
    assert 7 not in got
    # a bare edge is the oscillation case WITHOUT the self-vote; with it,
    # both endpoints settle on the smaller label in one round
    assert got[8] == got[9] == 8


def test_incremental_join_view_delta_rule(spark):
    from moosestack_spark.catalog.materialized_view import IncrementalJoinView

    a1 = spark.createDataFrame([(1, "a1"), (2, "a2")], ["k", "av"])
    a2 = spark.createDataFrame([(2, "a3"), (3, "a4")], ["k", "av"])
    b1 = spark.createDataFrame([(2, "b1")], ["k", "bv"])
    b2 = spark.createDataFrame([(1, "b2"), (2, "b3")], ["k", "bv"])

    v = IncrementalJoinView(on=["k"])
    v.refresh(da=a1)           # B empty: no output yet, state only
    v.refresh(db=b1)           # A_old x dB
    v.refresh(da=a2, db=b2)    # all three delta terms at once
    got = sorted((r.k, r.av, r.bv) for r in v.read().collect())

    full_a = a1.unionByName(a2)
    full_b = b1.unionByName(b2)
    want = sorted(
        (r.k, r.av, r.bv) for r in full_a.join(full_b, ["k"]).collect()
    )
    # k=1: 1x1, k=2: 2x2, k=3: unmatched -> 5 pairs
    assert got == want and len(got) == 5


def test_incremental_join_view_populate_then_refresh(spark):
    from moosestack_spark.catalog.materialized_view import IncrementalJoinView

    a = spark.createDataFrame([(1, "x")], ["k", "av"])
    b = spark.createDataFrame([(1, "y")], ["k", "bv"])
    v = IncrementalJoinView(on=["k"]).populate(a, b)
    v.refresh(da=spark.createDataFrame([(1, "x2")], ["k", "av"]))
    got = sorted((r.av, r.bv) for r in v.read().collect())
    assert got == [("x", "y"), ("x2", "y")]
