"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1-shaped pricing summary) at sf0.001.
queries()      — every implemented operator from SURVEY.md §2 + training-data
                 ops, one callable (spark, sf_dir) -> DataFrame each.
oracle_sql()   — DuckDB-ANSI equivalents for the hash-compare gate; omitted
                 only for approximate/sketch-based ops (rows-only check).

Implementations live in moosestack_spark/ (operators/, ops/); this module is
just the registry surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moosestack_spark import registry


def _loaded() -> None:
    registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _loaded()
    return registry.QUERIES["agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _loaded()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    _loaded()
    return dict(registry.ORACLES)
