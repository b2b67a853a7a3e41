"""Table-engine configs + validation rules (SURVEY.md §1.4).

Port target: packages/py-moose-lib/moose_lib/blocks.py:8-533 (engine config
classes) and dmv2/olap_table.py:120-289 (OlapConfig + engine-capability
validation at model_post_init).

Engines map to write/read policies on Parquet (engine_views.py applies the
read-time semantics).  Replication/cluster engines are storage-durability
concerns the lake already covers and are accepted as no-op aliases.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Optional, Sequence


class LifeCycle(Enum):
    """dmv2/life_cycle.py"""

    FULLY_MANAGED = "FULLY_MANAGED"
    DELETION_PROTECTED = "DELETION_PROTECTED"
    EXTERNALLY_MANAGED = "EXTERNALLY_MANAGED"


@dataclass(frozen=True)
class Engine:
    name: str = "MergeTree"
    # engine-capability flags (olap_table.py:191-289 validation)
    allows_order_by: bool = True
    allows_partition_by: bool = True
    allows_sample_by: bool = True
    read_only: bool = False


@dataclass(frozen=True)
class MergeTree(Engine):
    name: str = "MergeTree"


@dataclass(frozen=True)
class ReplacingMergeTree(Engine):
    """blocks.py:51-64 — dedup by sort key keeping max `ver`; `is_deleted`
    tombstones.  Read semantics: engine_views.replacing_latest."""

    name: str = "ReplacingMergeTree"
    ver: Optional[str] = None
    is_deleted: Optional[str] = None


@dataclass(frozen=True)
class SummingMergeTree(Engine):
    """blocks.py:75-82 — engine_views.summing_rollup on read."""

    name: str = "SummingMergeTree"
    columns: tuple[str, ...] = ()


@dataclass(frozen=True)
class AggregatingMergeTree(Engine):
    """blocks.py:68-71 — target of incremental MVs
    (catalog.materialized_view.IncrementalAggregateView)."""

    name: str = "AggregatingMergeTree"


@dataclass(frozen=True)
class CollapsingMergeTree(Engine):
    """blocks.py:86-97 — engine_views.collapsing_resolve on read."""

    name: str = "CollapsingMergeTree"
    sign: str = "sign"


@dataclass(frozen=True)
class VersionedCollapsingMergeTree(Engine):
    """blocks.py:101-116 — engine_views.versioned_collapsing_resolve."""

    name: str = "VersionedCollapsingMergeTree"
    sign: str = "sign"
    version: str = "version"


@dataclass(frozen=True)
class S3(Engine):
    """blocks.py:318-347 — direct path read/write (s3a:// on a cluster,
    local paths in tests)."""

    name: str = "S3"
    path: str = ""
    format: str = "parquet"


@dataclass(frozen=True)
class S3Queue(Engine):
    """blocks.py:290-314 — exactly-once file-queue ingestion == Spark file
    streaming source with checkpoint."""

    name: str = "S3Queue"
    path: str = ""
    format: str = "parquet"
    allows_order_by: bool = False
    allows_partition_by: bool = False
    allows_sample_by: bool = False


@dataclass(frozen=True)
class Merge(Engine):
    """blocks.py:512-533 — read-only union over tables matching a regex."""

    name: str = "Merge"
    table_regex: str = ".*"
    read_only: bool = True
    allows_order_by: bool = False
    allows_partition_by: bool = False
    allows_sample_by: bool = False


@dataclass(frozen=True)
class Kafka(Engine):
    """blocks.py:482-508 — table engine reading a topic; maps to the Kafka
    Structured-Streaming source (streaming-only: batch read is an error,
    mirroring how the CH engine is consumed via MVs)."""

    name: str = "Kafka"
    broker_list: str = ""
    topic_list: str = ""
    group_name: str = ""
    format: str = "JSONEachRow"
    allows_order_by: bool = False
    allows_partition_by: bool = False
    allows_sample_by: bool = False
    read_only: bool = True


@dataclass(frozen=True)
class IcebergS3(Engine):
    """blocks.py:425-478 (read-only) — query Iceberg snapshots through the
    native Spark Iceberg catalog (needs the iceberg-spark runtime on the
    cluster classpath)."""

    name: str = "IcebergS3"
    table: str = ""
    read_only: bool = True
    allows_order_by: bool = False
    allows_partition_by: bool = False
    allows_sample_by: bool = False


@dataclass(frozen=True)
class Buffer(Engine):
    """blocks.py:351-390 — RAM buffer; micro-batch trigger tuning, no-op."""

    name: str = "Buffer"
    allows_order_by: bool = False
    allows_partition_by: bool = False
    allows_sample_by: bool = False


@dataclass(frozen=True)
class Distributed(Engine):
    """blocks.py:394-421 — Spark is already distributed; accepted no-op."""

    name: str = "Distributed"


@dataclass
class TableIndex:
    """OlapConfig.TableIndex (olap_table.py:167-174).  Parquet/Delta column
    stats provide minmax skipping automatically; bloom_filter/tokenbf_v1/
    ngrambf_v1 indexes on a plain column enable REAL parquet bloom
    filters at write time (OlapTable._parquet_index_options); expression
    indexes are recorded for parity."""

    name: str
    expression: str
    type: str = "minmax"
    granularity: int = 1


@dataclass
class TableProjection:
    """OlapConfig.TableProjection (olap_table.py:176-180).

    Faithful ClickHouse semantics: an alternate physical ordering of the
    same rows, maintained on insert, consulted at read time when a query's
    predicate matches the projection's sort key better than the base
    order.  `order_by` is the projection's sort key; `select` (optional
    raw-SQL parity field) records the original CH projection text."""

    name: str
    order_by: Sequence[str] = ()
    select: str = ""


@dataclass
class SeedFilter:
    """OlapConfig.seed_filter (olap_table.py:183-189): per-table WHERE +
    LIMIT applied when seeding from a remote/source table (`moose seed`,
    cli/commands.rs:498-512)."""

    where: Optional[str] = None
    limit: Optional[int] = None


@dataclass
class OlapConfig:
    """dmv2/olap_table.py:120-189."""

    order_by_fields: Sequence[str] = ()
    order_by_expression: Optional[str] = None
    partition_by: Optional[str] = None
    sample_by_expression: Optional[str] = None
    primary_key_expression: Optional[str] = None
    engine: Engine = field(default_factory=MergeTree)
    version: Optional[str] = None
    settings: dict = field(default_factory=dict)
    ttl: Optional[str] = None
    indexes: list[TableIndex] = field(default_factory=list)
    projections: list[TableProjection] = field(default_factory=list)
    database: Optional[str] = None
    seed_filter: Optional[SeedFilter] = None
    life_cycle: LifeCycle = LifeCycle.FULLY_MANAGED

    def validate(self) -> None:
        """Engine-capability validation (olap_table.py:191-289)."""
        eng = self.engine
        if (self.order_by_fields or self.order_by_expression) and not eng.allows_order_by:
            raise ValueError(f"{eng.name} does not allow ORDER BY")
        if self.partition_by and not eng.allows_partition_by:
            raise ValueError(f"{eng.name} does not allow PARTITION BY")
        if self.sample_by_expression and not eng.allows_sample_by:
            raise ValueError(f"{eng.name} does not allow SAMPLE BY")
        if self.order_by_fields and self.order_by_expression:
            raise ValueError("order_by_fields and order_by_expression are exclusive")
        if self.projections and not isinstance(eng, (MergeTree, ReplacingMergeTree)):
            raise ValueError(f"{eng.name} does not allow projections")
