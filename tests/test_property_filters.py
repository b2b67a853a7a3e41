"""Property-based differential tests (hypothesis) for the filter-operator
compiler — the layer porting ts-moose-lib sql-utils.ts:55-215 semantics.

Strategy: generate random filter specs / combinator trees, evaluate them
once through the Spark Column compiler on a small typed dataset and once
through an independent pure-Python three-valued-logic evaluator; row sets
must match exactly.  Catches operator-translation slips (null propagation,
empty-in, skip-on-undefined, combinator folding) that example-based tests
miss.  (The reference itself has no property tests — SURVEY.md §5.)
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from moosestack_spark.query_layer.filter_ops import (
    and_,
    compile_filter,
    compile_filters,
    not_,
    or_,
)

ROWS = [
    {"i": i, "x": x, "s": s}
    for i, x, s in [
        (0, 0.5, "alpha"),
        (1, -2.0, "beta"),
        (2, 3.25, "gamma"),
        (3, None, "alpha"),
        (None, 7.0, None),
        (5, 0.0, ""),
        (6, -0.5, "ALPHA"),
        (7, 100.0, "delta"),
        (None, None, None),
        (9, 2.5, "alphabet"),
    ]
]


@pytest.fixture(scope="module")
def table(spark):
    df = spark.createDataFrame(
        [(r["i"], r["x"], r["s"]) for r in ROWS], "i int, x double, s string"
    ).cache()
    df.count()
    return df


# --- independent reference evaluator (SQL three-valued logic) -------------


def _cmp(op, a, b):
    if a is None or b is None:
        return None
    return {
        "eq": a == b,
        "ne": a != b,
        "gt": a > b,
        "gte": a >= b,
        "lt": a < b,
        "lte": a <= b,
    }[op]


def ref_eval(spec, row):
    col, op, value = spec
    v = row[col]
    if op == "isNull":
        return v is None
    if op == "isNotNull":
        return v is not None
    if value is None:
        return "SKIP"
    if op in ("eq", "ne", "gt", "gte", "lt", "lte"):
        return _cmp(op, v, value)
    if op == "in":
        if not value:
            return False
        return None if v is None else v in value
    if op == "notIn":
        if not value:
            return True
        return None if v is None else v not in value
    if op == "between":
        lo, hi = value
        if v is None:
            return None
        return lo <= v <= hi
    raise AssertionError(op)


def ref_and(parts):
    parts = [p for p in parts if p != "SKIP"]
    if not parts:
        return "SKIP"
    if any(p is False for p in parts):
        return False
    if any(p is None for p in parts):
        return None
    return True


def ref_or(parts):
    parts = [p for p in parts if p != "SKIP"]
    if not parts:
        return "SKIP"
    if any(p is True for p in parts):
        return True
    if any(p is None for p in parts):
        return None
    return False


def kept_ids(table, cond):
    if cond is None:
        return sorted(
            (r["i"] is None, r["i"]) for r in ROWS
        )  # no condition => all rows
    return sorted((r[0] is None, r[0]) for r in table.filter(cond).select("i").collect())


def ref_kept_ids(results):
    return sorted(
        (r["i"] is None, r["i"])
        for r, keep in zip(ROWS, results)
        if keep is True or keep == "SKIP"
    )


# --- strategies -----------------------------------------------------------

int_specs = st.tuples(
    st.just("i"),
    st.sampled_from(["eq", "ne", "gt", "gte", "lt", "lte"]),
    st.one_of(st.none(), st.integers(-2, 10)),
)
float_specs = st.tuples(
    st.just("x"),
    st.sampled_from(["eq", "ne", "gt", "gte", "lt", "lte"]),
    st.one_of(st.none(), st.sampled_from([-2.0, -0.5, 0.0, 0.5, 2.5, 3.25, 7.0])),
)
in_specs = st.tuples(
    st.just("i"),
    st.sampled_from(["in", "notIn"]),
    st.one_of(st.none(), st.lists(st.integers(-2, 10), max_size=4)),
)
between_specs = st.tuples(
    st.just("x"),
    st.just("between"),
    st.one_of(
        st.none(),
        st.tuples(
            st.sampled_from([-3.0, -0.5, 0.0, 1.0]),
            st.sampled_from([0.0, 2.5, 50.0, 200.0]),
        ),
    ),
)
null_specs = st.tuples(
    st.sampled_from(["i", "x", "s"]),
    st.sampled_from(["isNull", "isNotNull"]),
    st.none(),
)
any_spec = st.one_of(int_specs, float_specs, in_specs, between_specs, null_specs)

PROP_SETTINGS = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(spec=any_spec)
@PROP_SETTINGS
def test_single_clause_matches_reference(table, spec):
    cond = compile_filter(*spec)
    expected = ref_kept_ids([ref_eval(spec, r) for r in ROWS])
    assert kept_ids(table, cond) == expected


@given(specs=st.lists(any_spec, min_size=0, max_size=4))
@PROP_SETTINGS
def test_and_fold_matches_reference(table, specs):
    cond = compile_filters(specs)
    per_row = [ref_and([ref_eval(s, r) for s in specs]) for r in ROWS]
    assert kept_ids(table, cond) == ref_kept_ids(per_row)


@given(specs=st.lists(any_spec, min_size=0, max_size=4))
@PROP_SETTINGS
def test_or_fold_matches_reference(table, specs):
    cond = or_(compile_filter(*s) for s in specs)
    per_row = [ref_or([ref_eval(s, r) for s in specs]) for r in ROWS]
    assert kept_ids(table, cond) == ref_kept_ids(per_row)


@given(
    left=st.lists(any_spec, min_size=1, max_size=2),
    right=st.lists(any_spec, min_size=1, max_size=2),
)
@PROP_SETTINGS
def test_nested_not_or_and(table, left, right):
    # NOT(AND(left)) OR AND(right) — mixed tree with skip propagation
    cond = or_(
        [
            not_(and_(compile_filter(*s) for s in left)),
            and_(compile_filter(*s) for s in right),
        ]
    )

    def ref_not(v):
        if v == "SKIP":
            return "SKIP"
        return None if v is None else not v

    per_row = [
        ref_or(
            [
                ref_not(ref_and([ref_eval(s, r) for s in left])),
                ref_and([ref_eval(s, r) for s in right]),
            ]
        )
        for r in ROWS
    ]
    assert kept_ids(table, cond) == ref_kept_ids(per_row)
