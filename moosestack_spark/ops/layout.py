"""Z-order (Morton) data layout for multi-dimensional partition pruning.

Beyond-reference operator (SURVEY.md §8): the reference's layout story is
ClickHouse ORDER BY / PARTITION BY (one clustering dimension family —
dmv2 olap_table.py order_by_fields); lakes that must prune on TWO
independent dimensions (time AND tenant, user AND event type) interleave
the dimensions' bits into one Morton key and range-partition on it —
every file then covers a small hyper-rectangle of BOTH dimensions, so a
predicate on either prunes most files (the Delta/Iceberg OPTIMIZE ZORDER
technique, from the classic Morton-order literature).

Scale design (100 TB): the Morton key is a pure JVM bit-arithmetic
projection (no UDF, no shuffle); ``cluster_by_zorder`` adds ONE range
repartition — the same shuffle any layout rewrite pays — after which
min/max file statistics become selective on every interleaved dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def morton_expr(x: str, y: str, bits: int = 16) -> str:
    """SQL expression interleaving the low ``bits`` of two non-negative
    ints: bit i of x lands at position 2i, bit i of y at 2i+1.  Plain
    shift/and/multiply arithmetic — the SAME text evaluates in Spark SQL
    and DuckDB, which is how the gate oracles it."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def with_zorder(
    df: DataFrame, x: str, y: str, out_col: str = "zorder", bits: int = 16
) -> DataFrame:
    """Append the Morton key of (x, y) as ``out_col``."""
    return df.withColumn(
        out_col,
        F.expr(
            morton_expr(f"CAST({x} AS BIGINT)", f"CAST({y} AS BIGINT)", bits)
        ).cast("bigint"),
    )


def cluster_by_zorder(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int = 32,
    bits: int = 16,
    out_col: str = "zorder",
) -> DataFrame:
    """Range-repartition + in-partition sort by the Morton key of (x, y):
    the layout-rewrite shape (write the result and every output file's
    min/max covers a small rectangle of both dimensions).  Keeps the
    ``out_col`` column so writers can also PARTITION BY coarse buckets of
    it."""
    z = with_zorder(df, x, y, out_col=out_col, bits=bits)
    return z.repartitionByRange(num_partitions, out_col).sortWithinPartitions(
        out_col
    )


@query(
    "layout_zorder_index",
    oracle=f"""
SELECT event_id,
       {morton_expr('(user_id % 1024)', '(event_id % 1024)', 10)} AS zorder,
       {morton_expr('(user_id % 1024)', '(event_id % 1024)', 10)} // 4096
         AS zbucket
FROM events WHERE event_id % 7 = 0
""",
)
def layout_zorder_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key of (user_id mod 1024, event_id mod 1024) per event plus
    its coarse layout bucket (zorder div 4096 — the PARTITION BY
    granularity a writer would use).  Identical bit arithmetic evaluates
    on both engines, so the key hash-matches exactly."""
    ev = t(spark, sf_dir, "events").filter("event_id % 7 = 0")
    z = with_zorder(
        ev.selectExpr("event_id", "user_id % 1024 AS __x", "event_id % 1024 AS __y"),
        "__x", "__y", bits=10,
    )
    return z.select(
        "event_id",
        "zorder",
        F.expr("zorder div 4096").alias("zbucket"),
    )
