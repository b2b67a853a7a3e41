"""Property tests (hypothesis) for pagination/limit-clamp semantics
(ts sql-utils.ts:233-260, query-model.ts:783-794): page windows must tile
the ordered row space with no gaps/overlaps, and clamping must respect
[1, max_limit] with the 100-row default."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from moosestack_spark.query_layer.pagination import (
    DEFAULT_LIMIT,
    MAX_LIMIT,
    clamp_limit,
    limit_offset,
    paginate,
)

N_ROWS = 57


@pytest.fixture(scope="module")
def table(spark):
    df = spark.range(N_ROWS).orderBy("id").cache()
    df.count()
    return df


PROP_SETTINGS = settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(requested=st.one_of(st.none(), st.integers(-5, 3000)))
@PROP_SETTINGS
def test_clamp_limit_bounds(requested):
    n = clamp_limit(requested)
    assert 1 <= n <= MAX_LIMIT
    if requested is None:
        assert n == DEFAULT_LIMIT
    elif 1 <= requested <= MAX_LIMIT:
        assert n == requested


@given(page_size=st.integers(1, 20), page=st.integers(0, 8))
@PROP_SETTINGS
def test_paginate_window_is_exact_slice(table, page_size, page):
    got = [r.id for r in paginate(table.orderBy("id"), page_size, page).collect()]
    expected = list(range(N_ROWS))[page_size * page : page_size * (page + 1)]
    assert got == expected


@given(page_size=st.integers(1, 13))
@PROP_SETTINGS
def test_pages_tile_without_gap_or_overlap(table, page_size):
    seen: list[int] = []
    page = 0
    while True:
        rows = [r.id for r in paginate(table.orderBy("id"), page_size, page).collect()]
        if not rows:
            break
        seen.extend(rows)
        page += 1
    assert seen == list(range(N_ROWS))


@given(
    limit=st.one_of(st.none(), st.integers(1, 30)),
    offset=st.integers(0, 70),
)
@PROP_SETTINGS
def test_limit_offset_matches_python_slice(table, limit, offset):
    got = [r.id for r in limit_offset(table.orderBy("id"), limit, offset).collect()]
    n = limit if limit is not None else DEFAULT_LIMIT
    assert got == list(range(N_ROWS))[offset : offset + n]


@given(page_size=st.integers(-3, 0))
@PROP_SETTINGS
def test_paginate_rejects_bad_page_size(table, page_size):
    with pytest.raises(ValueError):
        paginate(table, page_size, 0)
