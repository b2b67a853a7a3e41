"""SparkSession factory with scale-oriented defaults.

Tested on local[32]; the conf below is chosen so the same logical plans hold on
a 1000-executor cluster against ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join selection)
- autoBroadcastJoinThreshold raised so dimension tables (region/nation/
  customer/supplier/part at any SF where they fit) broadcast instead of
  shuffling the fact side
- shuffle.partitions sized for the local harness; on a real cluster AQE's
  coalescePartitions makes the initial number mostly irrelevant
- session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are cluster-location independent
- Arrow enabled for the Pandas-UDF paths (dedup/similarity/multimodal ops)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "moosestack-spark", **extra_conf: str) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's reader
        # rejects; read as long and convert in tables.t().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra_conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
