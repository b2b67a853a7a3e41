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


# ---------------------------------------------------------------------------
# Hilbert curve layout — the locality-superior companion to Z-order: the
# Hilbert curve has no Morton "seams" (consecutive keys are always grid
# neighbors — unit-step adjacency is pinned in tests), so range-partitioned
# files cover tighter hyper-rectangles at equal file counts.  Same public
# xy2d bit algorithm as the classic space-filling-curve literature, in a
# division/xor-free arithmetic form ((3*rx) XOR ry == CASE rx=0 -> ry,
# rx=1 -> 3-ry) so the SAME round formula evaluates on Spark and DuckDB.
# ---------------------------------------------------------------------------


def hilbert_xy2d(bits: int, x: int, y: int) -> int:
    """Python reference: Hilbert distance of (x, y) on the 2^bits grid."""
    d = 0
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        m = s - 1
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * (ry if rx == 0 else 3 - ry)
        xm, ym = x & m, y & m
        if ry == 1:
            x, y = xm, ym
        elif rx == 1:
            x, y = m - ym, m - xm
        else:
            x, y = ym, xm
    return d


def _hilbert_round(s: int, x: str, y: str, d: str) -> tuple[str, str, str]:
    """One round of the xy2d fold as (x', y', d') SQL over bound names."""
    m = s - 1
    rx = f"(CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END)"
    d2 = f"({d} + {s * s} * (CASE WHEN {rx} = 0 THEN {ry} ELSE 3 - {ry} END))"
    xm, ym = f"({x} & {m})", f"({y} & {m})"
    x2 = (
        f"(CASE WHEN {ry} = 1 THEN {xm} "
        f"WHEN {rx} = 1 THEN {m} - {ym} ELSE {ym} END)"
    )
    y2 = (
        f"(CASE WHEN {ry} = 1 THEN {ym} "
        f"WHEN {rx} = 1 THEN {m} - {xm} ELSE {xm} END)"
    )
    return x2, y2, d2


def hilbert_expr(x: str, y: str, bits: int = 16) -> str:
    """Spark SQL expression for the Hilbert distance: rounds are chained
    through single-element transform() let-bindings (a struct state bound
    once per round), so the expression tree stays LINEAR in bits instead
    of exponential under projection collapse."""
    state = (
        f"named_struct('hx', CAST({x} AS BIGINT), "
        f"'hy', CAST({y} AS BIGINT), 'hd', CAST(0 AS BIGINT))"
    )
    for i in range(bits - 1, -1, -1):
        x2, y2, d2 = _hilbert_round(1 << i, "t.hx", "t.hy", "t.hd")
        state = (
            f"element_at(transform(array({state}), "
            f"t -> named_struct('hx', {x2}, 'hy', {y2}, 'hd', {d2})), 1)"
        )
    return f"({state}).hd"


def hilbert_oracle_sql(
    x: str, y: str, bits: int, carry: str, source: str
) -> str:
    """DuckDB replay: the same rounds as a nested-subquery chain (each
    level binds hx/hy/hd once — the CTE-free let-binding)."""
    inner = (
        f"SELECT {carry}, CAST({x} AS BIGINT) AS hx, "
        f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM {source}"
    )
    for i in range(bits - 1, -1, -1):
        x2, y2, d2 = _hilbert_round(1 << i, "hx", "hy", "hd")
        inner = (
            f"SELECT {carry}, {x2} AS hx, {y2} AS hy, {d2} AS hd "
            f"FROM ({inner})"
        )
    return inner


def with_hilbert(
    df: DataFrame, x: str, y: str, out_col: str = "hilbert", bits: int = 16
) -> DataFrame:
    """Append the Hilbert distance of (x, y) as ``out_col`` (JVM-side
    expression — no UDF, no shuffle)."""
    return df.withColumn(
        out_col,
        F.expr(
            hilbert_expr(f"CAST({x} AS BIGINT)", f"CAST({y} AS BIGINT)", bits)
        ).cast("bigint"),
    )


def cluster_by_hilbert(
    df: DataFrame,
    x: str,
    y: str,
    num_partitions: int = 32,
    bits: int = 16,
    out_col: str = "hilbert",
) -> DataFrame:
    """Range-repartition + in-partition sort by the Hilbert key — same
    rewrite shape as cluster_by_zorder with strictly better worst-case
    locality per output file."""
    h = with_hilbert(df, x, y, out_col=out_col, bits=bits)
    return h.repartitionByRange(num_partitions, out_col).sortWithinPartitions(
        out_col
    )


@query(
    "layout_hilbert_index",
    oracle=f"""
SELECT event_id, hd AS hilbert, hd // 4096 AS hbucket
FROM ({hilbert_oracle_sql(
        '(user_id % 1024)', '(event_id % 1024)', 10, 'event_id',
        '(SELECT event_id, user_id FROM events WHERE event_id % 7 = 0)')})
""",
)
def layout_hilbert_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert distance of (user_id mod 1024, event_id mod 1024) per event
    plus its coarse layout bucket — the alternative OPTIMIZE clustering
    key to layout_zorder_index.  The identical round arithmetic evaluates
    on both engines, so the key hash-matches exactly."""
    ev = t(spark, sf_dir, "events").filter("event_id % 7 = 0")
    h = with_hilbert(
        ev.selectExpr(
            "event_id", "user_id % 1024 AS __x", "event_id % 1024 AS __y"
        ),
        "__x",
        "__y",
        bits=10,
    )
    return h.select(
        "event_id",
        "hilbert",
        F.expr("hilbert div 4096").alias("hbucket"),
    )
