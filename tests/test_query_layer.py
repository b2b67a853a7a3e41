"""Unit tests for the query-layer semantics ported from
ts-moose-lib/src/query-layer/sql-utils.ts (filter ops, pagination clamps)
and the ClickHouse SQL translation map."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moosestack_spark.query_layer.filter_ops import (
    and_,
    compile_filter,
    compile_filters,
    not_,
    or_,
)
from moosestack_spark.query_layer.pagination import clamp_limit, limit_offset, paginate
from moosestack_spark.sql.ch_functions import translate_ch_sql


# ---- filter ops (sql-utils.ts:55-215 semantics) --------------------------


def test_skip_on_undefined_returns_none(spark):
    assert compile_filter("c", "eq", None) is None
    assert compile_filter("c", "like", None) is None
    assert compile_filter("c", "between", None) is None


def test_null_checks_ignore_value(spark):
    assert compile_filter("c", "isNull", None) is not None
    assert compile_filter("c", "isNotNull", None) is not None


def test_unknown_op_raises():
    with pytest.raises(ValueError, match="unknown filter op"):
        compile_filter("c", "regexp", "x")


def test_empty_in_semantics(spark):
    df = spark.range(5)
    # empty in => 1=0 (no rows); empty notIn => 1=1 (all rows)
    assert df.filter(compile_filters([("id", "in", [])])).count() == 0
    assert df.filter(compile_filters([("id", "notIn", [])])).count() == 5


def test_all_skipped_compiles_to_true(spark):
    df = spark.range(3)
    cond = compile_filters([("id", "eq", None), ("id", "gt", None)])
    assert df.filter(cond).count() == 3


def test_combinators_drop_skipped(spark):
    df = spark.range(10)
    c = and_([compile_filter("id", "gte", 3), None, compile_filter("id", "lt", 7)])
    assert df.filter(c).count() == 4
    c2 = or_([None, compile_filter("id", "eq", 1), compile_filter("id", "eq", 8)])
    assert df.filter(c2).count() == 2
    assert not_(None) is None
    assert df.filter(not_(compile_filter("id", "lt", 4))).count() == 6


def test_between_and_ops(spark):
    df = spark.range(10)
    assert df.filter(compile_filter("id", "between", (2, 5))).count() == 4
    assert df.filter(compile_filter("id", "ne", 0)).count() == 9


# ---- pagination (sql-utils.ts:233-260; query-model.ts:783-794) ------------


def test_clamp_limit_defaults_and_caps():
    assert clamp_limit(None) == 100  # request default
    assert clamp_limit(5000) == 1000  # maxLimit clamp
    assert clamp_limit(0) == 1
    assert clamp_limit(50) == 50


def test_paginate_math(spark):
    df = spark.range(100).orderBy("id")
    page2 = [r.id for r in paginate(df, page_size=10, page=2).collect()]
    assert page2 == list(range(20, 30))
    with pytest.raises(ValueError):
        paginate(df, page_size=0, page=0)
    with pytest.raises(ValueError):
        paginate(df, page_size=10, page=-1)


def test_limit_offset(spark):
    df = spark.range(100).orderBy("id")
    rows = [r.id for r in limit_offset(df, limit=5, offset=10).collect()]
    assert rows == list(range(10, 15))


# ---- ClickHouse SQL translation (SURVEY §2.9) -----------------------------


def test_translate_renames():
    out = translate_ch_sql("SELECT toDate(ts), countIf(x > 1) FROM t")
    assert "to_date(ts)" in out
    assert "count_if(x > 1)" in out


def test_translate_templates_nested():
    out = translate_ch_sql("SELECT toStartOfMonth(toDate(ts)) FROM t")
    assert out == "SELECT to_date(date_trunc('month', to_date(ts))) FROM t"


def test_translate_multiif():
    out = translate_ch_sql("SELECT multiIf(a > 1, 'x', b > 2, 'y', 'z') FROM t")
    assert out == "SELECT CASE WHEN a > 1 THEN 'x' WHEN b > 2 THEN 'y' ELSE 'z' END FROM t"


def test_translate_r3_additions():
    out = translate_ch_sql(
        "SELECT toYYYYMM(ts), toDayOfWeek(ts), position(s, 'a'), "
        "ifNull(nullIf(x, 0), -1), leftPad(s, 5, '_') FROM t"
    )
    assert "date_format(ts, 'yyyyMM')" in out
    assert "dayofweek(ts)" in out
    assert "locate('a', s)" in out  # CH arg order swapped to Spark's
    assert "nvl(nullif(x, 0), -1)" in out
    assert "lpad(s, 5, '_')" in out


def test_translate_day_of_week_convention(spark):
    # 2024-01-01 is a Monday: CH toDayOfWeek = 1
    spark.sql("SELECT timestamp'2024-01-01 10:00:00' AS ts").createOrReplaceTempView("dowt")
    q = translate_ch_sql("SELECT toDayOfWeek(ts) AS d FROM dowt")
    assert spark.sql(q).collect()[0].d == 1
    spark.sql("SELECT timestamp'2024-01-07 10:00:00' AS ts").createOrReplaceTempView("dowt")
    assert spark.sql(translate_ch_sql("SELECT toDayOfWeek(ts) AS d FROM dowt")).collect()[0].d == 7


def test_translate_unknown_raises():
    with pytest.raises(ValueError, match="not in the supported"):
        translate_ch_sql("SELECT dictGetHierarchy(a, b) FROM t")


def test_translate_runs_on_spark(spark):
    spark.range(10).selectExpr("id", "id * 1.5 as v", "timestamp'2024-01-02 03:04:05' as ts").createOrReplaceTempView(
        "tx"
    )
    q = translate_ch_sql(
        "SELECT toDayOfMonth(ts) AS d, countIf(v > 5) AS c, uniqExact(id) AS u FROM tx GROUP BY toDayOfMonth(ts)"
    )
    row = spark.sql(q).collect()[0]
    assert row.d == 2 and row.c == 6 and row.u == 10
