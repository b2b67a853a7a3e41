"""Gate queries driven through the semantic layer (QueryModel), the sql
template tag, and the Python Query() builder — proving the user-facing
surfaces end-to-end, not just raw DataFrame ops (SURVEY.md §2.2, §2.4,
§3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import dsum, sql_dsum
from moosestack_spark.query_layer.model import (
    Join,
    JoinColumn,
    QueryModel,
    QueryRequest,
)
from moosestack_spark.registry import query
from moosestack_spark.sql.query_builder import Query, and_, col
from moosestack_spark.sql.template import ColumnRef, TableRef
from moosestack_spark.sql.template import run as sql_run
from moosestack_spark.sql.template import sql, val
from moosestack_spark.tables import register_views, t


def _orders_model(spark: SparkSession, sf_dir: str) -> QueryModel:
    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    return QueryModel(
        source=orders,
        dimensions={
            "priority": "o_orderpriority",
            "status": "o_orderstatus",
            "segment": JoinColumn("cust", "c_mktsegment"),
        },
        metrics={
            "revenue": dsum("o_totalprice"),
            "n_orders": F.count(F.lit(1)),
            "max_price": F.max("o_totalprice"),
        },
        columns={
            "order_key": "o_orderkey",
            "total": "o_totalprice",
            "customer_name": JoinColumn("cust", "c_name"),
        },
        joins={"cust": Join(table=customer, left_key="o_custkey", right_key="c_custkey")},
        sortable=["revenue", "n_orders", "priority", "segment", "total", "order_key"],
    )


@query(
    "semantic_dims_metrics_groupby",
    oracle=f"""
SELECT * FROM (
  SELECT
    o_orderpriority AS priority,
    {sql_dsum('o_totalprice')} AS revenue,
    COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_orderpriority
) ORDER BY revenue DESC LIMIT 100
""",
)
def semantic_dims_metrics_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dims+metrics -> groupBy/agg with GROUP BY auto-derived
    (query-model.ts:710-778)."""
    model = _orders_model(spark, sf_dir)
    return model.query(
        QueryRequest(
            dimensions=["priority"],
            metrics=["revenue", "n_orders"],
            order_by=[("revenue", "desc")],
        )
    )


@query(
    "semantic_join_dimension_having",
    oracle=f"""
SELECT * FROM (
  SELECT
    c.c_mktsegment AS segment,
    {sql_dsum('o.o_totalprice')} AS revenue,
    COUNT(*) AS n_orders
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment
) WHERE n_orders > 100
ORDER BY segment ASC
LIMIT 100
""",
)
def semantic_join_dimension_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A join-backed dimension + HAVING via metric-named filter
    (query-model.ts:434-447, :474-494)."""
    model = _orders_model(spark, sf_dir)
    return model.query(
        QueryRequest(
            dimensions=["segment"],
            metrics=["revenue", "n_orders"],
            filters=[("n_orders", "gt", 100)],
            order_by=[("segment", "asc")],
        )
    )


@query(
    "semantic_detail_mode",
    oracle="""
SELECT o.o_orderkey AS order_key, o.o_totalprice AS total, c.c_name AS customer_name
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 400000
ORDER BY total DESC, order_key ASC
LIMIT 20
""",
)
def semantic_detail_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detail mode: columns without metrics -> plain select; filters with
    skip-on-undefined; pagination clamp."""
    model = _orders_model(spark, sf_dir)
    return model.query(
        QueryRequest(
            columns=["order_key", "total", "customer_name"],
            filters=[
                ("total", "gt", 400000),
                ("priority", "eq", None),  # skipped (undefined param)
            ],
            order_by=[("total", "desc"), ("order_key", "asc")],
            limit=20,
        )
    )


@query(
    "sql_template_params",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice > 300000 AND o_orderpriority = '1-URGENT'
""",
)
def sql_template_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sql template tag -> spark.sql(query, args=...) parameterized SQL
    (sqlHelpers.ts:137-286 -> native Spark parameter binding)."""
    register_views(spark, sf_dir)
    q = sql(
        "SELECT ",
        ColumnRef("o_orderkey"),
        ", ",
        ColumnRef("o_totalprice"),
        ", ",
        ColumnRef("o_orderpriority"),
        " FROM ",
        TableRef("orders"),
        " WHERE ",
        ColumnRef("o_totalprice"),
        " > ",
        300000,
        " AND ",
        ColumnRef("o_orderpriority"),
        " = ",
        val("1-URGENT"),
    )
    return sql_run(spark, q)


@query(
    "query_builder_chain",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal > 5000 AND c_mktsegment IN ('BUILDING', 'MACHINERY')
ORDER BY c_acctbal DESC, c_custkey ASC
LIMIT 25
""",
)
def query_builder_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query() builder chain (py query_builder.py:115-186)."""
    c = t(spark, sf_dir, "customer")
    return (
        Query(c)
        .where(and_(col("c_acctbal").gt(5000), col("c_mktsegment").in_(["BUILDING", "MACHINERY"])))
        .select("c_custkey", "c_name", "c_acctbal")
        .order_by(("c_acctbal", "desc"), "c_custkey")
        .limit(25)
        .df()
    )


# --------------------------------------------------------------------------
# Guarded read-only SQL (MCP query_olap, mcp/tools/query_olap.rs:19-80):
# statement whitelist + auto-LIMIT (default 100, max 1000).
# --------------------------------------------------------------------------


@query(
    "sql_guarded_limit",
    oracle="""
SELECT l_orderkey, l_linenumber FROM lineitem
ORDER BY l_orderkey, l_linenumber LIMIT 100
""",
)
def sql_guarded_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query_olap applies the default LIMIT 100 cap to an uncapped SELECT;
    the ORDER BY makes the capped prefix deterministic for the gate."""
    from moosestack_spark.sql.guarded import query_olap

    register_views(spark, sf_dir, only=["lineitem"])
    return query_olap(
        spark,
        "SELECT l_orderkey, l_linenumber FROM lineitem "
        "ORDER BY l_orderkey, l_linenumber",
    )
