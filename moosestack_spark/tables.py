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


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to a microsecond timestamp whatever the storage
    layout.  The driver has shipped events.parquet in two layouts so far:
    TIMESTAMP(NANOS) (read as int64 via the nanosAsLong legacy conf — needs a
    ns->us floor-truncate matching DuckDB) and TIMESTAMP(MICROS) (read as
    timestamp_ntz — already what we want).  Branch on the OBSERVED schema so
    either layout works; callers set the nanosAsLong conf *before* building
    `df` so the nanos layout doesn't error at scan time.  Works on both batch
    and streaming DataFrames (pure projection, analysis-time only)."""
    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("bigint", "long"):
        return df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    if ts_type == "timestamp_ntz":
        # Watermarks/windows require TIMESTAMP (with-tz).  Session tz is
        # pinned to UTC (session.py:30) so the cast preserves wall-clock
        # values and date_format output stays identical to the NTZ batch path.
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_event_ts(spark.read.parquet(path))


def register_views(
    spark: SparkSession, sf_dir: str, only: Sequence[str] | None = None
) -> None:
    """Register tables as temp views (for the spark.sql surface).  Pass
    `only` to register just the tables a query touches — registering all 10
    costs a schema read per table per call."""
    for name in only if only is not None else TABLE_NAMES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
