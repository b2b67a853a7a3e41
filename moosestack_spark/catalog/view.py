"""Views + SqlResource (SURVEY.md §1.1).

Port targets: py-moose-lib/moose_lib/dmv2/view.py:26 (View — plain SQL view)
and dmv2/sql_resource.py (SqlResource — raw setup/teardown SQL escape hatch).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class View:
    """CREATE VIEW name AS select (view.py:26) — temp view on the session
    (global catalog persistence arrives with a Hive/Delta metastore)."""

    name: str
    select: str  # Spark SQL text (already translated if CH-flavored)

    def create(self, spark: SparkSession) -> None:
        spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {self.name} AS {self.select}")

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.name)

    def drop(self, spark: SparkSession) -> None:
        spark.catalog.dropTempView(self.name)


@dataclass
class SqlResource:
    """Raw setup/teardown SQL (sql_resource.py) — the escape hatch."""

    name: str
    setup: list[str] = field(default_factory=list)
    teardown: list[str] = field(default_factory=list)

    def create(self, spark: SparkSession) -> None:
        for stmt in self.setup:
            spark.sql(stmt)

    def drop(self, spark: SparkSession) -> None:
        for stmt in self.teardown:
            spark.sql(stmt)
