"""Query/oracle registry backing __spark_entry__.py.

Each operator module registers its correctness-gate queries with::

    @query("q_name", oracle="SELECT ... ")
    def q_name(spark, sf_dir) -> DataFrame: ...

``oracle`` is the DuckDB-ANSI-SQL equivalent run side-by-side by the driver
(tables pre-registered as views).  Omit it only for genuinely
non-SQL-expressible ops (the driver then records a weaker rows-only check).

Column-name discipline: the driver sorts columns by name before hashing, so
every computed column is aliased identically in the Spark code and the SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module (side effect: registration)."""
    from moosestack_spark.operators import (  # noqa: F401
        aggregates,
        engines,
        filters,
        joins,
        mv,
        scalar_funcs,
        semantic,
        setops,
        skew,
        sortlimit,
        streaming_ops,
        windows,
    )
    from moosestack_spark.ops import (  # noqa: F401
        dedup,
        multimodal,
        similarity,
        text,
    )
