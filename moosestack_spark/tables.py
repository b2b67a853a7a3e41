"""Loaders for the driver-generated TPC-H-ish tables (see /root/repo/TESTDATA.md).

All queries go through ``t(spark, sf_dir, name)`` so that each table is a plain
parquet scan — Catalyst pushes filters and prunes columns into the scan, which
is exactly the plan shape we want at 100 TB (verify with
``df.explain('formatted')``: PushedFilters + ReadSchema).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic SF.  region and
# nation are fixed-size in TPC-H; customer/supplier/part grow with SF but stay
# orders of magnitude below the fact tables — whether they broadcast is left
# to AQE + autoBroadcastJoinThreshold rather than forced.
ALWAYS_BROADCAST = {"region", "nation"}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet — Spark has no nanosecond
    timestamp type.  Read nanos as long (legacy conf) and floor-truncate to
    microseconds, matching DuckDB's ns->us truncation so both engines see
    identical timestamp values."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return df


def register_views(
    spark: SparkSession, sf_dir: str, only: Sequence[str] | None = None
) -> None:
    """Register tables as temp views (for the spark.sql surface).  Pass
    `only` to register just the tables a query touches — registering all 10
    costs a schema read per table per call."""
    for name in only if only is not None else TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
