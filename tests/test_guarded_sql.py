"""Guarded read-only SQL entry (MCP query_olap parity: whitelist +
auto-LIMIT — mcp/tools/query_olap.rs:19-80)."""

from __future__ import annotations

import pytest

from moosestack_spark.sql.guarded import MAX_LIMIT, query_olap, validate_read_only
from moosestack_spark.tables import register_views


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize(
    "stmt",
    [
        "INSERT INTO lineitem VALUES (1)",
        "DROP TABLE lineitem",
        "UPDATE lineitem SET l_quantity = 0",
        "DELETE FROM lineitem",
        "CREATE TABLE x AS SELECT 1",
        "TRUNCATE TABLE lineitem",
        "SELECT 1; DROP TABLE lineitem",
        "EXPLAIN INSERT INTO lineitem VALUES (1)",
        "",
    ],
)
def test_rejects_non_read_statements(stmt):
    with pytest.raises(PermissionError):
        validate_read_only(stmt)


def test_select_gets_default_cap(spark):
    assert query_olap(spark, "SELECT l_orderkey FROM lineitem").count() == 100


def test_user_limit_respected_under_cap(spark):
    assert query_olap(spark, "SELECT l_orderkey FROM lineitem", limit=7).count() == 7


def test_cap_clamps_to_max(spark):
    n = query_olap(
        spark, "SELECT l_orderkey FROM lineitem LIMIT 5000", limit=999999
    ).count()
    assert n == MAX_LIMIT


def test_with_cte_allowed(spark):
    df = query_olap(
        spark, "WITH t AS (SELECT 1 AS a) SELECT * FROM t;", limit=10
    )
    assert df.count() == 1


def test_explain_and_show_allowed(spark):
    assert query_olap(spark, "EXPLAIN SELECT 1").count() >= 1
    assert query_olap(spark, "SHOW TABLES").count() >= 0


@pytest.mark.parametrize(
    "stmt",
    [
        # Spark's grammar allows a CTE list before DML ("ctes?
        # dmlStatementNoWith") — the first-keyword whitelist alone would let
        # these execute eagerly via spark.sql
        "WITH t AS (SELECT 1 AS a) INSERT INTO lineitem SELECT a FROM t",
        "WITH t AS (SELECT 1 AS a) UPDATE lineitem SET l_quantity = 0",
        "WITH t AS (SELECT 1 AS a) DELETE FROM lineitem",
        "WITH t AS (SELECT 1 AS a) "
        "MERGE INTO lineitem USING t ON 1=1 WHEN MATCHED THEN DELETE",
        "EXPLAIN WITH t AS (SELECT 1 AS a) INSERT INTO lineitem SELECT a FROM t",
    ],
)
def test_rejects_cte_fronted_dml(spark, stmt):
    with pytest.raises(PermissionError):
        query_olap(spark, stmt)


def test_parse_query_guard_keeps_valid_ctes(spark):
    # the grammar check must not over-reject real WITH..SELECT
    df = query_olap(
        spark,
        "WITH t AS (SELECT l_orderkey FROM lineitem LIMIT 5) SELECT * FROM t",
    )
    assert df.count() == 5
