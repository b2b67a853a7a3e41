"""Map-valued aggregates: CH ``sumMap`` / ``minMap`` / ``maxMap`` parity.

ClickHouse's sumMap (aggregate-functions/reference/summap) folds a map column
across rows, summing values per key and surfacing (sorted keys, aligned
values).  The reference exposes the full CH aggregate surface through its SQL
passthrough, so these belong in the dialect even though no template uses them
directly.

Spark has no native map-merging aggregate; the scale-correct expression is a
two-level aggregation:

1. ``groupBy(group, key) -> agg(value)`` — the wide shuffle, with map-side
   partial aggregation (the exchange carries one row per (group, key) per
   upstream partition, not raw events);
2. ``groupBy(group) -> sorted reassembly`` — collect_list over (key, value)
   structs; per group the row count is bounded by the key-space cardinality
   (event types, currencies, ... — small by construction for map aggregates),
   so the collect is safe at any SF.

This beats a MapType UDAF (single shuffle but Python-side merge) because both
exchanges stay in whole-stage codegen and partial-aggregate.

Determinism: values are exact decimal sums surfaced as integer cents
(``CAST(sum*100 AS BIGINT)``), and the map is serialized as a canonical
``key:cents`` string sorted by key — arrays can't be hashed by the driver
canonicalizer, and integer-string rendering is identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query
from moosestack_spark.tables import t


def map_aggregate(
    df: DataFrame,
    group_col: str,
    key_col: str,
    value_agg: Column,
    out_col: str,
) -> DataFrame:
    """Generic CH *Map aggregate: fold rows into a per-group sorted
    ``key:value`` map string.  ``value_agg`` is the per-(group,key) aggregate
    expression and must yield an integer-renderable type."""
    per_key = df.groupBy(group_col, key_col).agg(value_agg.alias("__v"))
    entry = F.struct(F.col(key_col).alias("k"), F.col("__v").alias("v"))
    return per_key.groupBy(group_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)),
                lambda s: F.concat_ws(":", s["k"], s["v"].cast("string")),
            ),
            ",",
        ).alias(out_col)
    )


def _sum_cents(col: str) -> Column:
    return (F.sum(F.col(col).cast("decimal(25,4)")) * 100).cast("bigint")


@query(
    "agg_sum_map",
    oracle="""
WITH per AS (
  SELECT user_id, event_type AS k,
    CAST(SUM(CAST(value AS DECIMAL(25,4))) * 100 AS BIGINT) AS v
  FROM events GROUP BY user_id, event_type
)
SELECT user_id,
  string_agg(k || ':' || CAST(v AS VARCHAR), ',' ORDER BY k) AS sum_map
FROM per GROUP BY user_id
""",
)
def agg_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumMap(map(event_type, value)) per user: total spend per event type,
    surfaced as a sorted key:cents map string."""
    ev = t(spark, sf_dir, "events")
    return map_aggregate(ev, "user_id", "event_type", _sum_cents("value"), "sum_map")


@query(
    "agg_min_max_map",
    oracle="""
WITH per AS (
  SELECT l_returnflag AS grp, l_linestatus AS k,
    CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS vmin,
    CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS vmax
  FROM lineitem GROUP BY l_returnflag, l_linestatus
)
SELECT grp,
  string_agg(k || ':' || CAST(vmin AS VARCHAR), ',' ORDER BY k) AS min_map,
  string_agg(k || ':' || CAST(vmax AS VARCHAR), ',' ORDER BY k) AS max_map
FROM per GROUP BY grp
""",
)
def agg_min_max_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """minMap / maxMap over lineitem prices keyed by linestatus.  Both maps
    come out of ONE two-level aggregation (shared shuffle), not one per
    aggregate — the same fusion CH does for multiple *Map aggregates over
    the same key expression."""
    li = t(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    per_key = li.groupBy(
        F.col("l_returnflag").alias("grp"), F.col("l_linestatus").alias("k")
    ).agg(
        (F.min(dec) * 100).cast("bigint").alias("vmin"),
        (F.max(dec) * 100).cast("bigint").alias("vmax"),
    )

    def _joined(value_field: str) -> Column:
        entry = F.struct(F.col("k"), F.col(value_field).alias("v"))
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)),
                lambda s: F.concat_ws(":", s["k"], s["v"].cast("string")),
            ),
            ",",
        )

    return per_key.groupBy("grp").agg(
        _joined("vmin").alias("min_map"), _joined("vmax").alias("max_map")
    )
