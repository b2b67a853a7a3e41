"""Property-based differential tests (hypothesis) for engine read
semantics — the dedup/rollup/collapse views that stand in for ClickHouse
merge behavior (SURVEY.md §1.4).

Random row multisets, split across random insert batches, must read back
exactly what an independent pure-Python evaluator computes.  Batch split
invariance is the key property: CH merges are order-dependent and eventual;
our read views must be total-input functions (same answer however the rows
arrived).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from moosestack_spark.catalog.engine_views import (
    collapsing_resolve,
    replacing_latest,
    summing_rollup,
)

PROP_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# rows: (key, ver, is_deleted, val)
replacing_rows = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.integers(0, 8),
        st.integers(0, 1),
        st.integers(-100, 100),
    ),
    min_size=1,
    max_size=40,
)


def _mk_df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


@given(rows=replacing_rows)
@PROP_SETTINGS
def test_replacing_latest_matches_reference(spark, rows):
    df = _mk_df(spark, rows, "k int, ver int, deleted int, val int")
    got = {
        (r.k, r.ver, r.val)
        for r in replacing_latest(
            df, ["k"], version_col="ver", is_deleted_col="deleted",
            tiebreakers=["val"],
        ).collect()
    }
    # reference: survivor per key = max (ver, val); a full (ver, val) tie
    # between a live row and its tombstone resolves to the LIVE row
    # (deterministic tombstone tiebreak); dropped if the survivor is deleted
    best: dict[int, tuple] = {}
    for k, ver, deleted, val in rows:
        cand = (ver, val, -deleted)
        cur = best.get(k)
        if cur is None or cand > cur:
            best[k] = cand
    expected = {
        (k, ver, val) for k, (ver, val, negdel) in best.items() if negdel == 0
    }
    assert got == expected


summing_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-50, 50), st.integers(-50, 50)),
    min_size=1,
    max_size=40,
)


@given(rows=summing_rows)
@PROP_SETTINGS
def test_summing_rollup_matches_reference(spark, rows):
    df = _mk_df(spark, rows, "k int, a int, b int")
    got = {(r.k, r.a, r.b) for r in summing_rollup(df, ["k"], ["a", "b"]).collect()}
    agg: dict[int, list] = {}
    for k, a, b in rows:
        agg.setdefault(k, [0, 0])
        agg[k][0] += a
        agg[k][1] += b
    expected = {(k, a, b) for k, (a, b) in agg.items()}
    assert got == expected


collapsing_rows = st.lists(
    st.tuples(st.integers(0, 4), st.sampled_from([1, -1]), st.integers(0, 20)),
    min_size=1,
    max_size=30,
)


@given(rows=collapsing_rows)
@PROP_SETTINGS
def test_collapsing_resolve_matches_reference(spark, rows):
    df = _mk_df(spark, rows, "k int, sign int, val int")
    out = collapsing_resolve(df, ["k"], "sign")
    got = {(r.k, r.val) for r in out.collect()}
    # reference: a -1 cancels the state row it COPIES (the CH user
    # contract), so cancellation nets per (key, content); a key keeps the
    # max-content row among its uncancelled states
    net: dict[tuple, int] = {}
    for k, sign, val in rows:
        net[(k, val)] = net.get((k, val), 0) + sign
    survivors: dict[int, int] = {}
    for (k, val), s in net.items():
        if s > 0 and (k not in survivors or val > survivors[k]):
            survivors[k] = val
    expected = {(k, v) for k, v in survivors.items()}
    assert got == expected


@given(
    rows=replacing_rows,
    split=st.integers(1, 4),
)
@PROP_SETTINGS
def test_replacing_is_batch_split_invariant(spark, rows, split):
    """However rows are partitioned into insert batches, the read view is
    identical — the property CH's eventual merges do NOT have."""
    df_all = _mk_df(spark, rows, "k int, ver int, deleted int, val int")
    parts = [rows[i::split] for i in range(split) if rows[i::split]]
    df_split = None
    for p in parts:
        d = _mk_df(spark, p, "k int, ver int, deleted int, val int")
        df_split = d if df_split is None else df_split.unionByName(d)
    read = lambda d: {
        (r.k, r.ver, r.val)
        for r in replacing_latest(
            d, ["k"], version_col="ver", is_deleted_col="deleted",
            tiebreakers=["val"],
        ).collect()
    }
    assert read(df_all) == read(df_split)


# ---------------------------------------------------------------------------
# Blocked-GEMM embedding dedup: pair-space completeness.  The block-pair
# cogroup must surface every qualifying unordered pair exactly once — a
# wrong block-pair enumeration silently loses (or duplicates) pairs.
# ---------------------------------------------------------------------------

emb_rows = st.lists(
    st.tuples(
        st.integers(0, 30),
        st.lists(st.integers(-3, 3), min_size=4, max_size=4),
    ),
    min_size=2,
    max_size=18,
    unique_by=lambda t: t[0],
)


@given(rows=emb_rows, threshold=st.sampled_from([-1.0, 0.0, 0.5, 0.9]))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_embedding_pairs_complete_and_unique(spark, rows, threshold):
    import math

    from moosestack_spark.ops.dedup import embedding_cosine_pairs

    # drop zero vectors (cosine undefined -> NaN never passes >=)
    rows = [(i, v) for i, v in rows if any(v)]
    if len(rows) < 2:
        return
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], "vid long, emb array<float>"
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(df, "vid", "emb", threshold, n_blocks=3).collect()
    )

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    expected = sorted(
        (min(i, j), max(i, j))
        for k, (i, a) in enumerate(rows)
        for j, b in rows[k + 1:]
        if cos(a, b) >= threshold
    )
    assert got == expected  # every pair once, none lost, none duplicated
