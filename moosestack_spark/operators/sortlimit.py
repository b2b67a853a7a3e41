"""Sort / limit / pagination operators (SURVEY.md §2.6).

Reference surface: Query().order_by/limit
(packages/py-moose-lib/moose_lib/query_builder.py:144-186) and the TS
limit/offset/paginate helpers with maxLimit clamping
(ts-moose-lib/src/query-layer/sql-utils.ts:233-260; query-model.ts:783-794).

Scale note: ORDER BY + LIMIT compiles to Spark's TakeOrderedAndProject — a
per-partition top-k then a driver merge of k-row heaps, NOT a global sort.
That is the right 100 TB plan; `df.offset(m).limit(n)` pagination extends it
to top-(m+n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.query_layer.pagination import clamp_limit, paginate
from moosestack_spark.registry import query
from moosestack_spark.tables import t

# --------------------------------------------------------------------------
# Multi-key ORDER BY asc/desc + LIMIT — deterministic via unique tiebreaker.
# --------------------------------------------------------------------------


@query(
    "sort_multikey_limit",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
LIMIT 50
""",
)
def sort_multikey_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")
        )
        .limit(50)
    )


# --------------------------------------------------------------------------
# Pagination: page 2 of a 20-row page over a deterministic ordering
# (paginate(pageSize, page) -> LIMIT pageSize OFFSET pageSize*page,
#  sql-utils.ts:243-251).
# --------------------------------------------------------------------------


@query(
    "sort_paginate",
    oracle="""
SELECT c_custkey, c_name, c_acctbal
FROM customer
ORDER BY c_acctbal DESC, c_custkey ASC
LIMIT 20 OFFSET 40
""",
)
def sort_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    ordered = c.select("c_custkey", "c_name", "c_acctbal").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return paginate(ordered, page_size=20, page=2)


# --------------------------------------------------------------------------
# maxLimit clamp: a request asking for 5000 rows is clamped to maxLimit=1000
# (query-model.ts:789; MCP query_olap.rs:19-21 uses the same 100/1000 caps).
# --------------------------------------------------------------------------


@query(
    "sort_limit_clamp",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 1000
""",
)
def sort_limit_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    requested = 5000
    n = clamp_limit(requested)  # -> 1000
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .limit(n)
    )


# --------------------------------------------------------------------------
# SAMPLE BY (OlapConfig.sample_by_expression, olap_table.py:154): CH samples
# deterministically by hashing the sample key; Spark's TABLESAMPLE/df.sample
# is seeded-random per split.  We expose BOTH: seeded df.sample (plan-level
# sampling, split-dependent) and the CH-faithful hash-mod filter (row-
# deterministic, engine-independent — what you want for repeatable dev
# queries over 100 TB).  The gate pins the hash-mod flavor via xxhash64
# (rows-only: DuckDB has no matching 64-bit hash).
# --------------------------------------------------------------------------


def _sample_hash_mod_oracle() -> str:
    from moosestack_spark.operators.aggregates import fmix32_duckdb_ctes

    ctes = fmix32_duckdb_ctes("o_orderkey", "o_orderstatus", "orders")
    return f"""
WITH {ctes}
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_sampled
FROM hashed WHERE h32 % 10 = 0
GROUP BY o_orderstatus
"""


@query("sample_hash_mod", oracle=_sample_hash_mod_oracle())
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample of orders by key hash + the sampled
    aggregate (the moose `SAMPLE 0.1` usage shape).  The keep decision
    hashes o_orderkey through the PORTABLE murmur3 fmix32 finalizer (the
    same arithmetic the deterministic HLL and the oracled temperature
    sampler use), so the sample is replayable in DuckDB and this query
    carries a hard value-hash gate instead of the rows-only check the old
    xxhash64 spelling allowed."""
    from moosestack_spark.operators.aggregates import fmix32_expr

    o = t(spark, sf_dir, "orders")
    sampled = o.filter(F.expr(f"({fmix32_expr('o_orderkey')}) % 10 = 0"))
    return sampled.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )


# --------------------------------------------------------------------------
# Stratified sampling with per-stratum rates (df.sampleBy's semantics made
# deterministic): membership is md5(key) mod 100 < rate[stratum], a pure
# function of the row — reproducible across runs, engines and partitionings,
# which seeded Bernoulli sampling is not.  md5 exists in both engines, so
# unlike the xxhash64 sample above this one gets a hard oracle row.
# Zero-shuffle until the final aggregate: the sample predicate is a scan
# filter.
# --------------------------------------------------------------------------

STRATA_RATES = {"O": 10, "F": 20, "P": 50}  # percent per o_orderstatus


@query(
    "sample_stratified",
    oracle=f"""
WITH rates(status, pct) AS (VALUES ('O', 10), ('F', 20), ('P', 50))
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_sampled
FROM orders JOIN rates ON o_orderstatus = status
WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
      % 100 < pct
GROUP BY o_orderstatus
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sample: 10% of 'O', 20% of 'F', 50% of
    'P' orders by key-hash membership, then the sampled histogram."""
    o = t(spark, sf_dir, "orders")
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint") % 100
    rate = F.create_map(
        *[x for s, p in STRATA_RATES.items() for x in (F.lit(s), F.lit(p))]
    )[F.col("o_orderstatus")]
    return (
        o.filter(bucket < rate)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
