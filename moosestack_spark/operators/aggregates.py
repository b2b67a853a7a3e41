"""Aggregation operators (SURVEY.md §2.4).

Covers the reference's aggregate vocabulary: count/sum/avg/min/max
(ts-moose-lib/src/query-layer/sql-utils.ts:284-345), countIf
(templates/python-tests/src/views/bar_aggregated.py:20), uniq/uniqExact,
argMax (templates/typescript-tests/src/ingest/dateAggregationModels.ts:12),
groupArray/any/anyLast, and HAVING-via-metric-filter
(ts-moose-lib/src/query-layer/query-model.ts:474-494).

All plans are single-shuffle hash aggregations with map-side partial
aggregation — the shape that scales linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.operators._determinism import davg, dsum, sql_davg, sql_dsum
from moosestack_spark.registry import query
from moosestack_spark.tables import register_views, t

# --------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary over lineitem.
# One shuffle on (l_returnflag, l_linestatus); partial aggs map-side; the
# shipdate filter reaches the parquet scan (PushedFilters).
# --------------------------------------------------------------------------

Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(8,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(8,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE) AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("agg_pricing_summary", oracle=Q1_ORACLE)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # Bounded decimal scales keep the 3-factor product within 38 digits of
    # precision in BOTH engines — no scale truncation, bit-exact sums.
    one = F.lit(1).cast("decimal(3,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(8,2)")
    tax = F.col("l_tax").cast("decimal(8,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# countIf — conditional aggregate (bar_aggregated.py:20 `countIf(has_text)`).
# Spark 3.5+ has F.count_if (JVM-side, codegen'd).
# --------------------------------------------------------------------------


@query(
    "agg_count_if",
    oracle="""
SELECT
  l_returnflag,
  COUNT(*) FILTER (WHERE l_discount > 0.05) AS discounted,
  COUNT(*) FILTER (WHERE l_quantity >= 25)  AS bulk,
  COUNT(*) AS total
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_if(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("discounted"),
        F.count_if(F.col("l_quantity") >= 25).alias("bulk"),
        F.count(F.lit(1)).alias("total"),
    )


# --------------------------------------------------------------------------
# uniqExact -> count(distinct); uniq (approx) is exposed in the engine but
# tested exactly here (approx sketches differ across engines by design).
# --------------------------------------------------------------------------


@query(
    "agg_count_distinct",
    oracle="""
SELECT
  l_returnflag,
  COUNT(DISTINCT l_partkey) AS uniq_parts,
  COUNT(DISTINCT l_suppkey) AS uniq_supps
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("uniq_parts"),
        F.countDistinct("l_suppkey").alias("uniq_supps"),
    )


# --------------------------------------------------------------------------
# argMax -> max_by / argMin -> min_by
# (reference: dateAggregationModels.ts:12 argMax usage)
# --------------------------------------------------------------------------


@query(
    "agg_arg_max",
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey DESC) AS rd,
    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice ASC, o_orderkey ASC) AS ra
  FROM orders
)
SELECT o_orderpriority,
  MAX(CASE WHEN rd = 1 THEN o_orderkey END) AS biggest_order,
  MAX(CASE WHEN ra = 1 THEN o_orderkey END) AS smallest_order,
  MAX(o_totalprice) AS max_price
FROM ranked
GROUP BY o_orderpriority
""",
)
def agg_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Composite (price, key) ordering key makes the argMax winner
    # deterministic under price ties (present in the test data).
    o = t(spark, sf_dir, "orders")
    key = F.struct("o_totalprice", "o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("biggest_order"),
        F.min_by("o_orderkey", key).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


# --------------------------------------------------------------------------
# groupArray -> collect_list (sorted for deterministic comparison),
# any/anyLast -> deterministic min/max-by stand-ins are NOT used; the engine
# maps any->first, anyLast->last, but the gate query pins an explicit order.
# --------------------------------------------------------------------------


@query(
    "agg_group_array",
    oracle="""
SELECT
  n_regionkey,
  ARRAY_TO_STRING(LIST(n_name ORDER BY n_name), ',') AS nations,
  COUNT(*) AS n
FROM nation
GROUP BY n_regionkey
""",
)
def agg_group_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The array itself is joined into a scalar string for the gate: the
    # driver's canonicalizer hashes columns via pandas factorize, which
    # cannot hash list-typed cells (r1 failure: "unhashable type: 'list'").
    # The sorted collect_list semantics are unchanged.
    n = t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# HAVING via metric filter (query-model.ts:474-494: filters whose column is a
# metric alias become HAVING).  groupBy + agg + filter on the aggregated col.
# --------------------------------------------------------------------------


@query(
    "agg_having",
    oracle=f"""
SELECT * FROM (
  SELECT
    l_partkey,
    {sql_dsum('l_quantity')} AS sum_qty,
    COUNT(*) AS n_items
  FROM lineitem
  GROUP BY l_partkey
) WHERE sum_qty > 150
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n_items"))
        .filter(F.col("sum_qty") > 150)
    )


# --------------------------------------------------------------------------
# Multi-dimensional rollup (free from Catalyst; exposed because the reference
# surface passes GROUP BY SQL through to ClickHouse which supports ROLLUP).
# --------------------------------------------------------------------------


@query(
    "agg_rollup",
    oracle="""
SELECT
  COALESCE(l_returnflag, '<all>') AS returnflag,
  COALESCE(l_linestatus, '<all>') AS linestatus,
  COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# quantile / quantileExact — the CH `quantile(level)(x)` family
# (SURVEY.md §2.9 agg vocabulary).  Spark: `percentile` (exact, linear
# interpolation — same estimator as DuckDB's quantile_cont).  At 100 TB the
# exact form needs a per-group sort of the value column; the engine also
# exposes `percentile_approx` (t-digest, single-pass mergeable sketch) as the
# scale path — the gate pins the exact variant because sketches are
# engine-specific.  Quartile levels on integral values interpolate on an
# exact 0.25 binary grid, so both engines produce bit-identical doubles.
# --------------------------------------------------------------------------


@query(
    "agg_quantile",
    oracle="""
SELECT
  l_returnflag,
  quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS p25_qty,
  quantile_cont(CAST(l_quantity AS DOUBLE), 0.50) AS median_qty,
  quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS p75_qty,
  MIN(l_quantity) AS min_qty,
  MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    return li.groupBy("l_returnflag").agg(
        F.percentile(q, F.lit(0.25)).alias("p25_qty"),
        F.percentile(q, F.lit(0.50)).alias("median_qty"),
        F.percentile(q, F.lit(0.75)).alias("p75_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# --------------------------------------------------------------------------
# GROUPING SETS (free from Catalyst, §2.4 "grouping sets/cube/rollup" —
# exposed because the CH SQL passthrough surface accepts them).
# --------------------------------------------------------------------------


@query(
    "agg_grouping_sets",
    oracle="""
SELECT COALESCE(l_returnflag, '<any>') AS returnflag,
       COALESCE(l_linestatus, '<any>') AS linestatus,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, '<any>') AS returnflag,
               COALESCE(l_linestatus, '<any>') AS linestatus,
               COUNT(*) AS n
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --------------------------------------------------------------------------
# uniq (approximate count-distinct, §2.9): HLL++ sketch — the single-pass
# mergeable path for 100 TB cardinalities.  Engine-specific sketch VALUES
# can't hash-match DuckDB, so the gate hard-oracles the sketch's accuracy
# CONTRACT instead (graduated round 6; previously rows-only): the query
# emits the exact count plus `within_band` = |approx - exact|/exact <= 0.05
# (2.5x the rsd=0.02 requested — Spark's documented band).  Spark computes
# the band check for real from its HLL++ estimate; the oracle replays exact
# and asserts TRUE, so any out-of-band estimate hash-mismatches.  The raw
# estimate remains covered by the rsd pytest (test_approx_sketches.py).
# --------------------------------------------------------------------------


@query(
    "agg_uniq_approx",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_band
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_uniq_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        (
            (
                F.abs(
                    F.approx_count_distinct("l_partkey", rsd=0.02)
                    - F.countDistinct("l_partkey")
                )
                / F.countDistinct("l_partkey")
            )
            <= F.lit(0.05)
        ).alias("within_band"),
    )


# --------------------------------------------------------------------------
# Deterministic HyperLogLog with a HARD oracle.  agg_uniq_approx above is
# rows-only because Spark's internal HLL++ hash can't be replayed in
# DuckDB; this variant builds the sketch from first principles with a
# cross-engine multiplicative hash, so every register — and therefore the
# estimate — hash-matches.  Flajolet et al. 2007 (the m=1024 alpha
# constant and the small-range linear-counting correction).
# --------------------------------------------------------------------------

_HLL_P = 10
_HLL_M = 1 << _HLL_P  # 1024 registers
_HLL_WBITS = 22  # 32-bit hash minus p index bits
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def fmix32_expr(key_sql: str) -> str:
    """Spark SQL expression: the murmur3 fmix32 avalanche of a non-negative
    integer key as a 32-bit value — the portable deterministic hash used by
    the HLL sketches and oracled sampling (every step replayable in DuckDB
    with the same arithmetic).  Every intermediate is bound ONCE through a
    single-element transform (the SQL let-binding) — a withColumn chain
    would be collapsed by the optimizer and the xor/mul steps reference
    their input 2-3 times each, so inlining grows the expression
    exponentially."""

    def bind(val: str, var: str, body: str) -> str:
        return f"element_at(transform(array({val}), {var} -> {body}), 1)"

    def mul32(h: str, c: int) -> str:
        return (
            f"(((({h}) % 65536) * {c} + (((({h}) DIV 65536) * {c}) % 65536)"
            f" * 65536) % 4294967296)"
        )

    h0 = f"(CAST({key_sql} AS BIGINT) * 2654435761) % 4294967296"
    s1 = bind(h0, "a", "(a ^ (a DIV 65536))")
    s2 = bind(s1, "b", mul32("b", 0x85EBCA6B))
    s3 = bind(s2, "c", "(c ^ (c DIV 8192))")
    s4 = bind(s3, "d", mul32("d", 0xC2B2AE35))
    return bind(s4, "e", "(e ^ (e DIV 65536))")


def fmix32_duckdb_ctes(key_sql: str, carry: str, source: str) -> str:
    """DuckDB CTE chain computing the same fmix32 value as fmix32_expr,
    carrying `carry` columns through; final CTE is named `hashed` with the
    value in column h32."""

    def mul32(h: str, c: int) -> str:
        return (
            f"(((({h}) % 65536) * {c} + (((({h}) // 65536) * {c}) % 65536)"
            f" * 65536) % 4294967296)"
        )

    return f"""
fx0 AS (SELECT {carry}, (CAST({key_sql} AS BIGINT) * 2654435761) % 4294967296 AS h0 FROM {source}),
fx1 AS (SELECT {carry}, xor(h0, h0 // 65536) AS h1 FROM fx0),
fx2 AS (SELECT {carry}, {mul32("h1", 0x85EBCA6B)} AS h2 FROM fx1),
fx3 AS (SELECT {carry}, xor(h2, h2 // 8192) AS h3 FROM fx2),
fx4 AS (SELECT {carry}, {mul32("h3", 0xC2B2AE35)} AS h4 FROM fx3),
hashed AS (SELECT {carry}, xor(h4, h4 // 65536) AS h32 FROM fx4)"""


def hll_idx_rank_expr(key_sql: str) -> str:
    """Spark SQL expression mapping a non-negative integer key to
    struct(idx, rank) for the deterministic HLL (fmix32_expr hash)."""

    def bind(val: str, var: str, body: str) -> str:
        return f"element_at(transform(array({val}), {var} -> {body}), 1)"

    s5 = fmix32_expr(key_sql)
    rank = bind(
        f"h DIV {_HLL_M}",
        "w",
        f"CASE WHEN w = 0 THEN {_HLL_WBITS + 1} ELSE {_HLL_WBITS + 1}"
        f" - length(conv(CAST(w AS BIGINT), 10, 2)) END",
    )
    return bind(s5, "h", f"struct(h % {_HLL_M} AS idx, {rank} AS rank)")


def hll_finalize(df: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group..., idx, m_j) register rows -> (group..., used_registers,
    hll_estimate).  Same estimate arithmetic as _hll_sql (exact dyadic sum,
    then alpha / linear-counting in double, FLOAT surface), as DataFrame
    ops so streaming sinks can finalize batch-side."""
    sk = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("used_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("den_used"),
    )
    raw = (
        F.lit(_HLL_ALPHA)
        * _HLL_M
        * _HLL_M
        / (F.col("den_used") + (_HLL_M - F.col("used_registers")))
    )
    linear = _HLL_M * F.log(
        F.lit(float(_HLL_M)) / (_HLL_M - F.col("used_registers"))
    )
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("used_registers") < _HLL_M), linear
    ).otherwise(raw)
    return sk.select(
        *group_cols, "used_registers", est.cast("float").alias("hll_estimate")
    )


def _hll_sql(engine: str) -> str:
    """Shared HLL query text; only the int-division / xor / bit-length
    tokens differ.  The hash is the murmur3 fmix32 avalanche finalizer —
    a multiplicative-only hash left lattice artifacts on sequential keys
    (34% estimate bias measured); fmix32 lands within the 1.04/sqrt(m)
    band.  The 32x32-bit multiplies are split into 16-bit halves so no
    intermediate exceeds 2^49 (DuckDB raises on signed-64 overflow)."""
    div = "DIV" if engine == "spark" else "//"
    bitlen = (
        "length(conv(CAST(w AS BIGINT), 10, 2))"
        if engine == "spark"
        else "length(bin(CAST(w AS BIGINT)))"
    )
    xor = (lambda a, b: f"({a} ^ {b})") if engine == "spark" else (
        lambda a, b: f"xor({a}, {b})"
    )

    def mul32(h: str, c: int) -> str:
        return (
            f"(((({h}) % 65536) * {c} + (((({h}) {div} 65536) * {c}) % 65536)"
            f" * 65536) % 4294967296)"
        )

    return f"""
WITH x AS (
  SELECT l_returnflag,
         (CAST(l_partkey AS BIGINT) * 2654435761) % 4294967296 AS h0
  FROM lineitem
),
s1 AS (SELECT l_returnflag, {xor("h0", f"h0 {div} 65536")} AS h1 FROM x),
s2 AS (SELECT l_returnflag, {mul32("h1", 0x85EBCA6B)} AS h2 FROM s1),
s3 AS (SELECT l_returnflag, {xor("h2", f"h2 {div} 8192")} AS h3 FROM s2),
s4 AS (SELECT l_returnflag, {mul32("h3", 0xC2B2AE35)} AS h4 FROM s3),
h AS (SELECT l_returnflag, {xor("h4", f"h4 {div} 65536")} AS h32 FROM s4),
reg AS (
  SELECT l_returnflag,
         h32 % {_HLL_M} AS idx,
         MAX(CASE WHEN w = 0 THEN {_HLL_WBITS + 1}
                  ELSE {_HLL_WBITS + 1} - {bitlen} END) AS m_j
  FROM (SELECT l_returnflag, h32, h32 {div} {_HLL_M} AS w FROM h)
  GROUP BY l_returnflag, h32 % {_HLL_M}
), sketch AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS used_registers,
         SUM(power(2.0, -m_j)) AS den_used
  FROM reg GROUP BY l_returnflag
)
SELECT l_returnflag,
       used_registers,
       CAST(CASE
         WHEN CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}
              / (den_used + ({_HLL_M} - used_registers)) <= 2.5 * {_HLL_M}
          AND used_registers < {_HLL_M}
           THEN {_HLL_M} * ln(CAST({_HLL_M} AS DOUBLE)
                              / ({_HLL_M} - used_registers))
         ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}
              / (den_used + ({_HLL_M} - used_registers))
       END AS FLOAT) AS hll_estimate
FROM sketch
"""


@query("agg_hll_deterministic", oracle=_hll_sql("duckdb"))
def agg_hll_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principles HyperLogLog (p=10) per returnflag with a HARD
    value-hash oracle: the 32-bit multiplicative hash, register index, and
    rank are exact integer arithmetic in both engines; register maxima and
    the 2^-M sum are exact dyadic rationals (order-independent); only the
    final alpha/ln arithmetic is floating — surfaced as FLOAT.

    This is also the distributed-sketch PLAN template: groupBy(group, idx)
    max(rank) then groupBy(group) — both exchanges map-side combined,
    per-group state bounded at m registers regardless of cardinality, and
    the same max-merge works across partitions, nodes, or incremental
    batches (the CH uniqState/uniqMerge contract, §2.4)."""
    register_views(spark, sf_dir, only=["lineitem"])
    return spark.sql(_hll_sql("spark"))


@query(
    "agg_uniq_exact",
    oracle="""
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_uniq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic half of the uniq pair, split out so it gets a hard
    oracle row (the sketch estimate in agg_uniq_approx stays rows-only with
    an rsd-band pytest — engine-specific HLL values can't hash-match)."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )


# --------------------------------------------------------------------------
# topK heavy hitters (CH topK(k)(col), aggregate-functions/reference).  The
# reference's topK is approximate (filtered space-saving); we compute the
# EXACT top-k with a deterministic tiebreak (count desc, value asc).
# Plan shape: (group, value) counts with map-side combine, then a
# PARTITION-LOCAL top-k (window over (group, partition_id) — every cell is
# one partition's slice of one group's values, so no single sort ever sees
# a group's full distinct space), then the global per-group window over at
# most k rows per group per upstream partition.  Exactness: the order
# (count desc, value asc) is total, and a global top-k element beats all
# but < k elements in ANY subset containing it — so global winners are
# always local winners and the pre-prune loses nothing.  This is what keeps
# unbounded-cardinality value columns from serializing one group's entire
# distinct space through a single per-group sort at 100 TB.
# Output is array_join'd: the driver canonicalizer can't hash arrays.
# --------------------------------------------------------------------------


@query(
    "agg_top_k",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_partkey, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_partkey
), r AS (
  SELECT l_returnflag, l_partkey,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cnt DESC, l_partkey ASC) AS rk
  FROM c
)
SELECT l_returnflag,
       array_to_string(LIST(l_partkey ORDER BY rk), ',') AS top_parts
FROM r WHERE rk <= 3 GROUP BY l_returnflag
""",
)
def agg_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return top_k(li, "l_returnflag", "l_partkey", 3).select(
        "l_returnflag",
        F.array_join(
            F.transform("top_values", lambda v: v.cast("string")), ","
        ).alias("top_parts"),
    )


def top_k(df: DataFrame, group_col: str, value_col: str, k: int) -> DataFrame:
    """Exact heavy hitters per group: array of the k most frequent values
    (count desc, value asc tiebreak) as `top_values`.  Two-stage window:
    partition-local top-k bounds the global per-group sort at k rows per
    upstream partition (see module comment for the exactness argument)."""
    from pyspark.sql import Window

    counts = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("__cnt"))
    order = [F.col("__cnt").desc(), F.col(value_col).asc()]
    local = Window.partitionBy(group_col, "__pid").orderBy(*order)
    pruned = (
        counts.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrk", F.row_number().over(local))
        .filter(F.col("__lrk") <= k)
        .drop("__pid", "__lrk")
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    ranked = pruned.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") <= k
    )
    return ranked.groupBy(group_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__rk"), F.col(value_col)))
        ).alias("__s")
    ).select(
        group_col,
        F.transform(F.col("__s"), lambda s: s[value_col]).alias("top_values"),
    )


# --------------------------------------------------------------------------
# uniqUpTo(N) (CH aggregate-functions/uniqupto): exact distinct count if
# <= N, else N+1 ("more than N").  The CH use case is cheap cardinality
# triage; LEAST(countDistinct, N+1) preserves the contract exactly.
# --------------------------------------------------------------------------


@query(
    "agg_uniq_up_to",
    oracle="""
SELECT l_returnflag,
       CAST(LEAST(COUNT(DISTINCT l_suppkey), 51) AS BIGINT) AS supp_up_to_50,
       CAST(LEAST(COUNT(DISTINCT l_linenumber), 5) AS BIGINT) AS line_up_to_4
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_uniq_up_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.least(F.countDistinct("l_suppkey"), F.lit(51))
        .cast("bigint")
        .alias("supp_up_to_50"),
        F.least(F.countDistinct("l_linenumber"), F.lit(5))
        .cast("bigint")
        .alias("line_up_to_4"),
    )


# --------------------------------------------------------------------------
# quantileExactWeighted (CH): smallest x whose cumulative weight reaches
# q of the total — exact, no interpolation, so it hash-gates cleanly.
# Implemented with an integer comparison (2*cum >= total for q=0.5) to
# keep float arithmetic out of the decision entirely.  One shuffle for the
# per-group window + one for the final min.
# --------------------------------------------------------------------------


def quantile_exact_weighted_median(
    df: DataFrame, group_col: str, value_col: str, weight_col: str
) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    cum = df.withColumn("__cw", F.sum(weight_col).over(w)).withColumn(
        "__tw", F.sum(weight_col).over(wt)
    )
    return (
        cum.filter(2 * F.col("__cw") >= F.col("__tw"))
        .groupBy(group_col)
        .agg(F.min(value_col).alias("weighted_median"))
    )


@query(
    "agg_quantile_weighted",
    oracle="""
WITH c AS (
  SELECT l_returnflag, l_quantity,
         SUM(l_linenumber) OVER (PARTITION BY l_returnflag ORDER BY l_quantity ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(l_linenumber) OVER (PARTITION BY l_returnflag) AS tw
  FROM lineitem
)
SELECT l_returnflag, MIN(l_quantity) AS weighted_median
FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag
""",
)
def agg_quantile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of l_quantity weighted by l_linenumber per
    return flag (CH quantileExactWeighted(0.5) semantics)."""
    li = t(spark, sf_dir, "lineitem")
    return quantile_exact_weighted_median(
        li, "l_returnflag", "l_quantity", "l_linenumber"
    )


# --------------------------------------------------------------------------
# topKWeighted (CH): heavy hitters ranked by a summed weight instead of a
# row count.  Same two-stage partition-local prune as top_k — the order
# (weight desc, value asc) is total, so global winners are local winners.
# avgWeighted (CH): sum(w*x)/sum(w), computed in exact decimal so the
# division happens once on engine-identical operands.
# --------------------------------------------------------------------------


def top_k_weighted(
    df: DataFrame, group_col: str, value_col: str, weight_col: str, k: int
) -> DataFrame:
    """Top-k values per group by total weight (weight desc, value asc)."""
    from pyspark.sql import Window

    sums = df.groupBy(group_col, value_col).agg(
        F.sum(F.col(weight_col).cast("decimal(25,4)")).alias("__w")
    )
    order = [F.col("__w").desc(), F.col(value_col).asc()]
    local = Window.partitionBy(group_col, "__pid").orderBy(*order)
    pruned = (
        sums.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrk", F.row_number().over(local))
        .filter(F.col("__lrk") <= k)
        .drop("__pid", "__lrk")
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        pruned.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .groupBy(group_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__rk"), F.col(value_col)))
                    ),
                    lambda s: s[value_col].cast("string"),
                ),
                ",",
            ).alias("top_values")
        )
    )


@query(
    "agg_top_k_weighted",
    oracle="""
WITH s AS (
  SELECT l_returnflag, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(25,4))) AS w
  FROM lineitem GROUP BY l_returnflag, l_suppkey
), r AS (
  SELECT l_returnflag, l_suppkey,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY w DESC, l_suppkey ASC) AS rk
  FROM s
)
SELECT l_returnflag,
       array_to_string(LIST(l_suppkey ORDER BY rk), ',') AS top_values
FROM r WHERE rk <= 3 GROUP BY l_returnflag
""",
)
def agg_top_k_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per return flag by total shipped quantity
    (CH topKWeighted semantics, exact decimal weights)."""
    li = t(spark, sf_dir, "lineitem")
    return top_k_weighted(li, "l_returnflag", "l_suppkey", "l_quantity", 3)


@query(
    "agg_avg_weighted",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE)
       / CAST(SUM(CAST(l_quantity AS DECIMAL(8,2))) AS DOUBLE) AS avg_price_weighted
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_avg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted average price per return flag (CH avgWeighted).
    Both sums are exact decimals cast to double individually, then ONE
    IEEE division — decimal/decimal division would round at an
    engine-specific result scale and break the hash."""
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(8,2)")
    return li.groupBy("l_returnflag").agg(
        (F.sum(price * qty).cast("double") / F.sum(qty).cast("double"))
        .alias("avg_price_weighted")
    )
