"""OlapTable on Parquet: typed create/insert/read with the reference's
validation strategies and engine read semantics (SURVEY.md §2.1 "Table
insert", §1.4).

Port target: packages/py-moose-lib/moose_lib/dmv2/olap_table.py —
- InsertOptions validation strategies 'fail-fast' | 'discard' | 'isolate'
  with allow_errors / allow_errors_ratio thresholds (:37-53)
- array insert (:876-926), stream/iterator insert batched at 1000 (:927-986)
- isolate = binary-split retry batching (:821-874)
- versioned physical name {name}_{version with _} (:422-440)

Spark-first storage model:
- a table is a Parquet directory under the warehouse root; appends are new
  files (the MergeTree append model); ORDER BY becomes sortWithinPartitions
  on write (sorted parts -> row-group stat pruning); PARTITION BY becomes
  partitionBy (partition pruning).
- engine read semantics (Replacing/Summing/Collapsing dedup-on-read) are
  applied by .read() via catalog.engine_views — deterministic, strictly
  more consistent than ClickHouse's eventual merges.
- at 100 TB the same layout holds: partition columns shard the scan,
  sorted-by-key files give min/max pruning, and appends never rewrite.

Validation runs through Pydantic (the model IS the schema) before rows
reach the JVM; at cluster scale validation of large streams should go
through the streaming path instead (foreachBatch + poison routing), which
shares the same DLQ envelope.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
from datetime import datetime, timedelta, timezone
from collections.abc import Iterable, Iterator, Sequence
from dataclasses import dataclass, field
from typing import Any, Generic, Optional, TypeVar

from pydantic import BaseModel, ValidationError
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.catalog import engine_views
from moosestack_spark.catalog.engines import (
    CollapsingMergeTree,
    Engine,
    IcebergS3,
    Kafka,
    LifeCycle,
    Merge,
    OlapConfig,
    ReplacingMergeTree,
    S3,
    S3Queue,
    SummingMergeTree,
    VersionedCollapsingMergeTree,
)
from moosestack_spark.datamodel.reflection import to_columns, to_struct_type

# Snapshot manifests are exactly v<digits>.json; anything else in the
# snapshot dir is ignored (editor backups, OS metadata files, ...).
_MANIFEST_RE = re.compile(r"^v\d+\.json$")

T = TypeVar("T", bound=BaseModel)

STREAM_INSERT_BATCH = 1000  # olap_table.py:961
MAX_INSERT_BLOCK = 100_000  # olap_table.py:736-739

# The reference Kafka->table sync batches <= 100k rows per insert and
# flushes at most every 1s (kafka_clickhouse_sync.rs:55-57); Spark's
# equivalent knobs are maxOffsetsPerTrigger + the micro-batch trigger.
KAFKA_MAX_OFFSETS_PER_TRIGGER = 100_000


def kafka_reader_options(eng) -> dict[str, str]:
    """The pinned Kafka reader contract (no broker in this container, so
    the contract IS the test surface — tests/test_kafka_contract.py):

    - startingOffsets=earliest on first start; afterwards the CHECKPOINT
      owns progress, giving offset-commit-after-successful-write — the
      at-least-once discipline of the reference sync (inserter.rs offset
      tracking), upgraded to exactly-once into the table sink;
    - maxOffsetsPerTrigger bounds a micro-batch at the reference's 100k
      insert ceiling;
    - kafka.group.id carries the consumer-group name for broker-side ACLs
      and lag monitoring (Spark itself tracks offsets in the checkpoint).
    """
    return {
        "kafka.bootstrap.servers": eng.broker_list,
        "subscribe": eng.topic_list,
        "kafka.group.id": eng.group_name,
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": str(KAFKA_MAX_OFFSETS_PER_TRIGGER),
    }


def kafka_value_frame(raw: DataFrame, schema) -> DataFrame:
    """JSON wire bytes -> typed records (the sync's
    mapper_json_to_clickhouse_record shape, kafka_clickhouse_sync.rs:722):
    parse the value bytes against the table schema and keep the source
    coordinates (topic, partition, offset) for lineage/DLQ reporting.
    Works identically on the streaming kafka frame and on a batch frame of
    captured wire rows — which is how the contract is tested brokerless."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r"),
        "topic",
        "partition",
        "offset",
    ).select("r.*", "topic", "partition", "offset")


@dataclass
class InsertOptions:
    """olap_table.py:37-53."""

    strategy: str = "fail-fast"  # fail-fast | discard | isolate
    allow_errors: Optional[int] = None
    allow_errors_ratio: Optional[float] = None

    def __post_init__(self) -> None:
        if self.strategy not in ("fail-fast", "discard", "isolate"):
            raise ValueError(f"unknown insert strategy {self.strategy!r}")


@dataclass
class InsertResult:
    inserted: int
    failed: int
    errors: list[str] = field(default_factory=list)


class OlapTable(Generic[T]):
    """Typed OLAP table (dmv2/olap_table.py:291)."""

    def __init__(
        self,
        name: str,
        model: type[T],
        spark: SparkSession,
        warehouse: str,
        config: Optional[OlapConfig] = None,
        register: bool = True,
    ):
        self.name = name
        self.model = model
        self.spark = spark
        self.config = config or OlapConfig()
        self.config.validate()
        self.schema = to_struct_type(model)
        self.columns = to_columns(model)
        self.warehouse = warehouse
        os.makedirs(self.path, exist_ok=True)
        # lifecycle registry (dmv2/_registry.py): the CLI's plan/migrate
        # reflect registered tables into the planner's target InfraMap.
        # register=False opts ephemeral tables (test fixtures, temp gates)
        # out so they never surface in infra_map_from_registry().
        self._registered = register
        if register:
            from moosestack_spark.catalog import resources

            resources.register_table(self)

    # -- naming ------------------------------------------------------------

    @property
    def physical_name(self) -> str:
        """Versioned name {name}_{1_0} (olap_table.py:422-440)."""
        if self.config.version:
            return f"{self.name}_{self.config.version.replace('.', '_')}"
        return self.name

    @property
    def path(self) -> str:
        db = self.config.database or "default"
        return os.path.join(self.warehouse, db, self.physical_name)

    # -- validation --------------------------------------------------------

    def _split_json_columns(self, row: dict) -> dict:
        """Typed-path Json columns (ClickHouseJson, data_models.py:597-637):
        the Pydantic dump of an extra='allow' inner model carries typed
        fields AND extras in one dict — split it into the struct shape the
        schema declares: typed paths as native fields, every other path
        serialized into the __dynamic JSON remainder, minus skip_paths /
        skip_regexps (ClickHouse's SKIP / SKIP REGEXP never stores those)."""
        import json as _json
        import re as _re

        from moosestack_spark.datamodel.types import JSON_DYNAMIC_FIELD

        for col in self.columns:
            typed = col.annotations.get("json_typed_paths")
            if typed is None or not isinstance(row.get(col.name), dict):
                continue
            val = row[col.name]
            skips = set(col.annotations.get("json_skip_paths", ()))
            regexps = [
                _re.compile(p)
                for p in col.annotations.get("json_skip_regexps", ())
            ]
            out = {k: val.get(k) for k in typed}
            dyn = {
                k: v
                for k, v in val.items()
                if k not in typed
                and k not in skips
                and not any(r.search(k) for r in regexps)
            }
            out[JSON_DYNAMIC_FIELD] = (
                _json.dumps(dyn, sort_keys=True, separators=(",", ":"))
                if dyn
                else None
            )
            row = {**row, col.name: out}
        return row

    def _validate_rows(
        self, rows: Sequence[dict | T], options: InsertOptions
    ) -> tuple[list[dict], list[tuple[dict, str]]]:
        ok: list[dict] = []
        failed: list[tuple[dict, str]] = []
        for r in rows:
            if isinstance(r, BaseModel):
                ok.append(self._split_json_columns(r.model_dump()))
                continue
            try:
                ok.append(self._split_json_columns(self.model(**r).model_dump()))
            except ValidationError as exc:
                if options.strategy == "fail-fast":
                    raise
                failed.append((r, str(exc)))
        # extra insert-time checks the Spark types can't express
        checked: list[dict] = []
        for row in ok:
            err = self._range_check(row)
            if err is None:
                checked.append(row)
            elif options.strategy == "fail-fast":
                raise ValueError(err)
            else:
                failed.append((row, err))
        return checked, failed

    def _range_check(self, row: dict) -> Optional[str]:
        """FixedString length + unsigned range checks (SURVEY §7 part 6)."""
        for col in self.columns:
            v = row.get(col.name)
            if v is None:
                continue
            fixed = col.annotations.get("fixed_length")
            if fixed is not None and len(str(v)) != fixed:
                return f"{col.name}: FixedString({fixed}) got length {len(str(v))}"
            ch_type = col.annotations.get("ch_type", "")
            if ch_type.startswith("UInt") and isinstance(v, int):
                bits = int(ch_type[4:])
                if v < 0 or v >= (1 << bits):
                    return f"{col.name}: {ch_type} out of range: {v}"
            elif ch_type.startswith("Int") and isinstance(v, int):
                bits = int(ch_type[3:])
                lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
                if not (lo <= v <= hi):
                    return f"{col.name}: {ch_type} out of range: {v}"
        return None

    def _check_thresholds(
        self, n_ok: int, failures: list, options: InsertOptions
    ) -> None:
        n_failed = len(failures)
        total = n_ok + n_failed
        if options.allow_errors is not None and n_failed > options.allow_errors:
            raise ValueError(
                f"insert exceeded allow_errors={options.allow_errors}: "
                f"{n_failed} failures; first: {failures[0][1] if failures else ''}"
            )
        if (
            options.allow_errors_ratio is not None
            and total > 0
            and (n_failed / total) > options.allow_errors_ratio
        ):
            raise ValueError(
                f"insert exceeded allow_errors_ratio={options.allow_errors_ratio}: "
                f"{n_failed}/{total}"
            )

    # -- writes ------------------------------------------------------------

    # CH codec -> parquet compression (ClickHouseCodec data_models.py:75-77;
    # parquet has no per-column codecs in the Spark writer, so the first
    # recognized column codec — or a table-level settings["compression"] —
    # selects the file codec; delta/double-delta style encodings are
    # already what parquet's encodings do automatically)
    _CODEC_MAP = {"ZSTD": "zstd", "LZ4": "lz4", "LZ4HC": "lz4", "GZIP": "gzip",
                  "SNAPPY": "snappy", "NONE": "none", "UNCOMPRESSED": "none"}

    def _parquet_compression(self) -> Optional[str]:
        explicit = self.config.settings.get("compression")
        if explicit:
            return self._CODEC_MAP.get(str(explicit).upper(), str(explicit).lower())
        for c in self.columns:
            codec = c.annotations.get("_codec") or c.codec
            if not codec:
                continue
            base = str(codec).split("(")[0].strip().upper()
            if base in self._CODEC_MAP:
                return self._CODEC_MAP[base]
        return None

    def _parquet_index_options(self) -> dict[str, str]:
        """CH skip indexes -> REAL parquet bloom filters (TableIndex
        olap_table.py:167-174).  Any bloom_filter / tokenbf_v1 /
        ngrambf_v1 index enables per-row-group parquet bloom filters on
        the write — the same point-lookup row-group skipping the CH index
        provides (min/max stats cover the `minmax` type natively).

        Engine note: this Spark/parquet build ignores the per-column
        `parquet.bloom.filter.enabled#col` writer option (verified
        empirically — file bytes unchanged), so blooms are enabled
        table-wide with the filter size capped by the max index
        granularity (a superset of the requested skipping; the write-size
        cost is the cap times columns per row group).  Expression indexes
        stay metadata-only, as documented."""
        bloom_granularities = [
            idx.granularity
            for idx in self.config.indexes
            if idx.type in ("bloom_filter", "tokenbf_v1", "ngrambf_v1")
        ]
        if not bloom_granularities:
            return {}
        return {
            "parquet.bloom.filter.enabled": "true",
            "parquet.bloom.filter.max.bytes": str(
                max(65536, max(bloom_granularities) * 65536)
            ),
        }

    def _append_df(self, df: DataFrame) -> None:
        if self.config.life_cycle == LifeCycle.EXTERNALLY_MANAGED:
            raise PermissionError(f"{self.name} is EXTERNALLY_MANAGED (read-only)")
        eng = self.config.engine
        if getattr(eng, "read_only", False) or isinstance(eng, S3Queue):
            raise PermissionError(
                f"{self.name}: engine {eng.name} is read-only / consume-only"
            )
        if isinstance(eng, S3):
            # direct-path engine: rows land at the external location
            # (s3a:// on a cluster; any hadoop-fs path locally) in the
            # engine's format (blocks.py:318-347)
            df.write.mode("append").format(eng.format).save(eng.path)
            return
        writer = df
        if self.config.order_by_fields:
            # sorted parts: files internally ordered by the sort key ->
            # parquet row-group min/max stats give range-scan pruning.
            writer = df.sortWithinPartitions(*self.config.order_by_fields)
        elif self.config.order_by_expression:
            # expression flavor (olap_table.py:151-155): e.g. "toDate(ts), id"
            exprs = [
                F.expr(e.strip())
                for e in self.config.order_by_expression.split(",")
                if e.strip()
            ]
            writer = df.sortWithinPartitions(*exprs)
        out = writer.write.mode("append")
        codec = self._parquet_compression()
        if codec:
            out = out.option("compression", codec)
        for k, v in self._parquet_index_options().items():
            out = out.option(k, v)
        if self.config.partition_by:
            out = out.partitionBy(self.config.partition_by)
        out.parquet(self.path)
        if self.config.projections:
            self._write_projections(df)
        self._commit_snapshot("append")

    # -- snapshots / time travel --------------------------------------------
    #
    # Every mutation commits a manifest (the full data-file list) to the
    # SIBLING dir {path}__snapshots/v{n}.json (outside the data dir, like
    # projections, so base rewrites never destroy history) — the
    # Iceberg/Delta snapshot model reduced to its read side: read_at(v)
    # plans ONLY that manifest's files, so readers are isolated from
    # concurrent appends, any appended version can be re-read (rollback,
    # reproducible training runs), and the file-list DIFF between two
    # versions is an incremental-consumption feed.  Append-only history is
    # fully retained; full REWRITES (optimize / TTL / mutations) replace
    # the physical files, RETIRING earlier snapshots — read_at on a
    # retired version raises instead of returning partial data (a real
    # lake keeps old files until VACUUM; rewrite-in-place is this
    # warehouse's documented trade-off).  At lake scale manifests record
    # per-commit file deltas compacted periodically; the full-list
    # spelling keeps the semantics identical with less machinery.

    @property
    def _snapdir(self) -> str:
        return self.path + "__snapshots"

    def _data_files(self) -> list[str]:
        out: list[str] = []
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                if f.endswith(".parquet"):
                    out.append(
                        os.path.relpath(os.path.join(root, f), self.path)
                    )
        return sorted(out)

    def _commit_snapshot(self, op: str) -> int:
        import json as _json

        os.makedirs(self._snapdir, exist_ok=True)
        # max+1, not count+1: vacuum may have dropped old manifests and a
        # reused number would sort a NEW snapshot before the current head
        snaps = self.snapshots()
        version = (snaps[-1]["version"] + 1) if snaps else 1
        manifest = {"version": version, "op": op, "files": self._data_files()}
        tmp = os.path.join(self._snapdir, f".v{version}.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self._snapdir, f"v{version}.json"))
        return version

    def snapshots(self) -> list[dict]:
        import json as _json

        if not os.path.isdir(self._snapdir):
            return []
        out = []
        # Strict manifest-name match: a stray non-manifest file in the
        # snapshot dir (editor backup, "version.json") must not break every
        # snapshot/read_at/vacuum operation with a ValueError.
        for f in sorted(
            (f for f in os.listdir(self._snapdir) if _MANIFEST_RE.match(f)),
            key=lambda f: int(f[1:-5]),
        ):
            out.append(_json.load(open(os.path.join(self._snapdir, f))))
        return out

    def _snapshot_by_version(self, version: int) -> dict:
        """Manifest lookup by version NUMBER (not list position — vacuum
        may have dropped older manifests)."""
        for snap in self.snapshots():
            if snap["version"] == version:
                return snap
        have = [s["version"] for s in self.snapshots()]
        raise ValueError(f"{self.name}: no snapshot v{version} (have {have})")

    def read_at(self, version: int) -> DataFrame:
        """The table as of snapshot `version` (1-based): scans ONLY that
        manifest's files, with the engine's read semantics applied.
        Raises on a version retired by a later rewrite (missing files)."""
        files = [
            os.path.join(self.path, f)
            for f in self._snapshot_by_version(version)["files"]
        ]
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"{self.name}: snapshot v{version} was retired by a later "
                f"rewrite ({len(missing)} file(s) gone)"
            )
        if not files:
            return self.spark.createDataFrame([], self._storage_schema())
        raw = self.spark.read.schema(self._storage_schema()).parquet(*files)
        return self._with_engine_semantics(raw)

    def vacuum(self, keep_last: int = 10) -> tuple[int, int]:
        """Trim snapshot history and remove unreferenced data files — the
        lake VACUUM/expire-snapshots job.  Keeps the most recent
        ``keep_last`` manifests; deletes (1) older manifests and (2) data
        files referenced by NO kept manifest (orphans of restores and
        crashed writes), plus stale rewrite temp dirs.  Returns
        (manifests_removed, files_removed).  read_at/changed_files on an
        expired version raise with the surviving version list — the same
        contract as a rewrite-retired snapshot."""
        import glob as _glob

        if self.config.life_cycle != LifeCycle.FULLY_MANAGED:
            # EXTERNALLY_MANAGED data was never snapshot-committed (every
            # file would look unreferenced and be wiped); DELETION_PROTECTED
            # forbids the file removal outright
            raise PermissionError(f"{self.name} life_cycle forbids vacuum")
        snaps = self.snapshots()
        if not snaps:
            # no manifests (pre-snapshot-era dir or external writes):
            # NOTHING is provably unreferenced — refuse to guess
            return 0, 0
        keep = snaps[-keep_last:] if keep_last > 0 else snaps[-1:]
        keep_versions = {s["version"] for s in keep}
        referenced: set[str] = set()
        for s in keep:
            referenced.update(s["files"])

        files_removed = 0
        for f in self._data_files():
            if f not in referenced:
                os.remove(os.path.join(self.path, f))
                files_removed += 1
        # prune now-empty partition dirs so the scan doesn't trip on them
        for root, dirs, files in os.walk(self.path, topdown=False):
            if root != self.path and not dirs and not files:
                os.rmdir(root)

        manifests_removed = 0
        if os.path.isdir(self._snapdir):
            for fn in list(os.listdir(self._snapdir)):
                if _MANIFEST_RE.match(fn):
                    if int(fn[1:-5]) not in keep_versions:
                        os.remove(os.path.join(self._snapdir, fn))
                        manifests_removed += 1
        for tmp in _glob.glob(self.path + ".__*_tmp"):
            shutil.rmtree(tmp, ignore_errors=True)
        return manifests_removed, files_removed

    def changed_files(self, from_version: int, to_version: int) -> list[str]:
        """Files ADDED between two snapshots — the incremental-consumption
        feed (a downstream job reads only these, never re-scans history)."""
        before = (
            set(self._snapshot_by_version(from_version)["files"])
            if from_version >= 1
            else set()
        )
        after = set(self._snapshot_by_version(to_version)["files"])
        return sorted(after - before)

    def restore(self, version: int) -> int:
        """Roll the live table back to snapshot `version` by DELETING the
        data files later snapshots added — zero data copy (append-only
        history means the target files are still on disk; a version retired
        by a rewrite raises first).  Commits a new snapshot, so the restore
        itself is in the history.  Returns files removed."""
        want = set(self._snapshot_by_version(version)["files"])
        missing = [f for f in want if not os.path.exists(os.path.join(self.path, f))]
        if missing:
            raise FileNotFoundError(
                f"{self.name}: snapshot v{version} was retired by a later "
                f"rewrite ({len(missing)} file(s) gone)"
            )
        removed = 0
        for f in self._data_files():
            if f not in want:
                os.remove(os.path.join(self.path, f))
                removed += 1
        self._rebuild_projections()
        self._commit_snapshot(f"restore v{version}")
        return removed

    def insert(
        self,
        data: Sequence[dict | T] | Iterator[dict | T] | DataFrame,
        options: Optional[InsertOptions] = None,
    ) -> InsertResult:
        """Insert with validation strategies (olap_table.py:988-1055).

        - Sequence: validated per-row via Pydantic then appended as one block
        - Iterator: consumed in 1000-row batches (olap_table.py:961)
        - DataFrame: appended as-is (already-typed fast path)
        """
        options = options or InsertOptions()
        if isinstance(data, DataFrame):
            # count via an Observation riding the write's own execution —
            # a separate data.count() would re-run the entire input lineage
            # (at 100 TB the insert source would compute twice)
            from pyspark.sql import Observation

            obs = Observation()
            self._append_df(data.observe(obs, F.count(F.lit(1)).alias("n")))
            return InsertResult(inserted=obs.get["n"], failed=0)

        if isinstance(data, Iterator):
            total_ok = 0
            all_failed: list[tuple[dict, str]] = []
            batch: list = []
            for item in data:
                batch.append(item)
                if len(batch) >= STREAM_INSERT_BATCH:
                    r = self._insert_block(batch, options)
                    total_ok += r.inserted
                    all_failed.extend(zip([None] * len(r.errors), r.errors))
                    batch = []
            if batch:
                r = self._insert_block(batch, options)
                total_ok += r.inserted
                all_failed.extend(zip([None] * len(r.errors), r.errors))
            return InsertResult(total_ok, len(all_failed), [e for _, e in all_failed])

        return self._insert_block(list(data), options)

    def _insert_block(self, rows: list, options: InsertOptions) -> InsertResult:
        if options.strategy == "isolate":
            return self._insert_isolate(rows, options)
        ok, failed = self._validate_rows(rows, options)
        self._check_thresholds(len(ok), failed, options)
        if ok:
            df = self.spark.createDataFrame(ok, self.schema)
            # one part file per ~MAX_INSERT_BLOCK rows, like a MergeTree
            # insert writing one part per block — without this, a 1-row
            # insert fans out into a file per default partition (32 mostly
            # empty files per append: the small-files explosion)
            n_files = max(1, math.ceil(len(ok) / MAX_INSERT_BLOCK))
            self._append_df(df.coalesce(n_files))
        return InsertResult(len(ok), len(failed), [e for _, e in failed])

    def _insert_isolate(self, rows: list, options: InsertOptions) -> InsertResult:
        """Binary-split retry (olap_table.py:821-874): try the whole block;
        on failure split in halves recursively so every valid row lands and
        every poison row is isolated with its own error."""
        ok_rows: list[dict] = []
        failures: list[tuple[Any, str]] = []

        def attempt(chunk: list) -> None:
            try:
                validated = [
                    r.model_dump() if isinstance(r, BaseModel) else self.model(**r).model_dump()
                    for r in chunk
                ]
                for row in validated:
                    err = self._range_check(row)
                    if err:
                        raise ValueError(err)
                ok_rows.extend(validated)
            except Exception as exc:
                if len(chunk) == 1:
                    failures.append((chunk[0], str(exc)))
                else:
                    mid = len(chunk) // 2
                    attempt(chunk[:mid])
                    attempt(chunk[mid:])

        attempt(rows)
        self._check_thresholds(len(ok_rows), failures, options)
        if ok_rows:
            self._append_df(self.spark.createDataFrame(ok_rows, self.schema))
        return InsertResult(len(ok_rows), len(failures), [e for _, e in failures])

    # -- reads -------------------------------------------------------------

    def read_raw(self) -> DataFrame:
        """Physical rows, pre-merge state included."""
        eng = self.config.engine
        if isinstance(eng, (S3, S3Queue)):
            # S3: direct path read; S3Queue batch read = current backlog
            # (the streaming consume path is stream_reader())
            return (
                self.spark.read.schema(self._storage_schema())
                .format(eng.format)
                .load(eng.path)
            )
        if isinstance(eng, Merge):
            return self._merge_union(eng)
        if isinstance(eng, IcebergS3):
            # local directory-layout table -> native metadata walk (no
            # Iceberg jars needed, catalog/iceberg_native.py); anything
            # else (catalog refs, s3://) needs the iceberg-spark runtime
            loc = eng.table
            loc_path = loc[7:] if loc.startswith("file://") else loc
            if os.path.isdir(os.path.join(loc_path, "metadata")):
                from moosestack_spark.catalog.iceberg_native import (
                    IcebergNativeTable,
                )

                return IcebergNativeTable(self.spark, loc_path).read()
            return self.spark.read.format("iceberg").load(loc)
        if isinstance(eng, Kafka):
            raise PermissionError(
                f"{self.name}: Kafka engine tables are streaming-only — "
                "use stream_reader()"
            )
        try:
            return self.spark.read.schema(self._storage_schema()).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], self.schema)

    def _merge_union(self, eng: Merge) -> DataFrame:
        """Merge engine (blocks.py:512-533): unionByName over warehouse
        tables whose physical name matches the regex; columns missing from a
        member surface as NULLs (allowMissingColumns)."""
        db_dir = os.path.join(self.warehouse, self.config.database or "default")
        pat = re.compile(eng.table_regex)
        out: Optional[DataFrame] = None
        for name in sorted(os.listdir(db_dir)) if os.path.isdir(db_dir) else []:
            tdir = os.path.join(db_dir, name)
            if name == self.physical_name or not os.path.isdir(tdir):
                continue
            if not pat.fullmatch(name):
                continue
            try:
                member = self.spark.read.parquet(tdir)
            except Exception:
                continue
            out = member if out is None else out.unionByName(
                member, allowMissingColumns=True
            )
        if out is None:
            return self.spark.createDataFrame([], self.schema)
        return out

    def stream_reader(self):
        """Streaming source for queue/topic engines:

        - S3Queue (blocks.py:290-314): file-stream over the path — with a
          checkpoint this is exactly-once per file, the same guarantee the
          CH engine documents;
        - Kafka (blocks.py:482-508): kafka source (needs the
          spark-sql-kafka connector on the cluster classpath), with the
          reference sync's batching discipline pinned in
          kafka_reader_options.
        """
        eng = self.config.engine
        if isinstance(eng, S3Queue):
            return (
                self.spark.readStream.schema(self._storage_schema())
                .format(eng.format)
                .load(eng.path)
            )
        if isinstance(eng, Kafka):
            return (
                self.spark.readStream.format("kafka")
                .options(**kafka_reader_options(eng))
                .load()
            )
        raise TypeError(f"engine {eng.name} is not a streaming source")

    def _storage_schema(self):
        return self.schema

    def read(self) -> DataFrame:
        """Engine read semantics applied (SURVEY.md §1.4)."""
        return self._with_engine_semantics(self.read_raw())

    def _with_engine_semantics(self, df: DataFrame) -> DataFrame:
        eng = self.config.engine
        if isinstance(eng, ReplacingMergeTree):
            keys = self._sort_keys()
            # no version column: tiebreak on the PAYLOAD columns (content-
            # ordered survivor).  Constraints that matter:
            # - not the partition keys (identical per window -> arbitrary);
            # - not is_deleted (a tombstone winning purely because 1 > 0
            #   would erase keys with live rows);
            # - orderable types only (maps cannot be sorted).
            # Ties on the whole orderable payload fall to is_deleted ASC:
            # the live row wins over an otherwise-identical tombstone.
            excluded = {*keys, eng.ver, eng.is_deleted} - {None}
            candidates = sorted(c for c in df.columns if c not in excluded)
            ordp, _ = engine_views.split_orderable(df, candidates)
            tiebreakers = ordp or keys
            return engine_views.replacing_latest(
                df, keys, version_col=eng.ver, is_deleted_col=eng.is_deleted,
                tiebreakers=() if eng.ver else tiebreakers,
            )
        if isinstance(eng, SummingMergeTree):
            keys = self._sort_keys()
            sum_cols = list(eng.columns) or [
                f.name
                for f in self.schema.fields
                if f.name not in keys and f.dataType.typeName() in
                ("long", "integer", "short", "byte", "double", "float", "decimal")
            ]
            return engine_views.summing_rollup(df, keys, sum_cols)
        if isinstance(eng, VersionedCollapsingMergeTree):
            keys = [k for k in self._sort_keys() if k not in (eng.sign, eng.version)]
            return engine_views.versioned_collapsing_resolve(df, keys, eng.sign, eng.version)
        if isinstance(eng, CollapsingMergeTree):
            keys = [k for k in self._sort_keys() if k != eng.sign]
            return engine_views.collapsing_resolve(df, keys, eng.sign)
        return df

    def _sort_keys(self) -> list[str]:
        if self.config.order_by_fields:
            return list(self.config.order_by_fields)
        return [c.name for c in self.columns if c.primary_key]

    # -- maintenance (moose truncate / peek, cli/commands.rs) --------------

    def truncate(self) -> None:
        if self.config.life_cycle != LifeCycle.FULLY_MANAGED:
            raise PermissionError(f"{self.name} life_cycle forbids truncate")
        shutil.rmtree(self.path, ignore_errors=True)
        os.makedirs(self.path, exist_ok=True)
        for proj in self.config.projections:
            shutil.rmtree(self._projection_path(proj.name), ignore_errors=True)
        self._commit_snapshot("truncate")

    def peek(self, n: int = 10) -> list[dict]:
        """moose peek (cli/commands.rs:104-118)."""
        return [r.asDict(recursive=True) for r in self.read().limit(n).collect()]

    def drop(self) -> None:
        if self.config.life_cycle == LifeCycle.DELETION_PROTECTED:
            raise PermissionError(f"{self.name} is DELETION_PROTECTED")
        shutil.rmtree(self.path, ignore_errors=True)
        # a dropped table must leave the lifecycle registry, or the next
        # plan/migrate re-creates it from the dangling entry
        from moosestack_spark.catalog import resources

        resources.unregister_table(self)

    def seed_from(self, source: DataFrame) -> int:
        """`moose seed` (cli/commands.rs:498-512): copy rows from a source
        DataFrame (remote catalog table, another environment's export, ...)
        applying the table's seed_filter WHERE + LIMIT.  Returns rows
        seeded.  The filter is pushed into the source scan by Catalyst —
        a seed of a 100 TB source with a selective WHERE reads only the
        matching splits."""
        sf = self.config.seed_filter
        df = source
        if sf and sf.where:
            df = df.filter(sf.where)
        if sf and sf.limit is not None:
            df = df.limit(sf.limit)
        df = df.select(*[f.name for f in self.schema.fields])
        # Materialize once: count() and _append_df() as independent jobs over
        # a lazy source can observe different rows (LIMIT without ordering,
        # nondeterministic sources), making the returned count unreliable.
        df = df.localCheckpoint(eager=True)
        n = df.count()
        self._append_df(df)
        return n

    # -- projections (OlapConfig.TableProjection, olap_table.py:176-180) ---

    def _projection_path(self, name: str) -> str:
        # sibling dir (suffix, not child) so base parquet reads never see it
        return self.path + f"__proj_{name}"

    def _write_projections(self, df: DataFrame) -> None:
        for proj in self.config.projections:
            out = df
            if proj.order_by:
                out = df.sortWithinPartitions(*proj.order_by)
            out.write.mode("append").parquet(self._projection_path(proj.name))

    def read_for_predicate(self, *filter_cols: str) -> DataFrame:
        """Route a read to the physical copy whose sort key serves the
        predicate columns best (CH picks projections the same way): the
        copy with the longest sort-key prefix contained in filter_cols;
        ties/none -> base table.  Row-group min/max stats on the matching
        copy then prune the scan."""
        want = set(filter_cols)

        def prefix_len(keys: Sequence[str]) -> int:
            n = 0
            for k in keys:
                if k in want:
                    n += 1
                else:
                    break
            return n

        best_df = self.read()
        best_score = prefix_len(self._sort_keys())
        for proj in self.config.projections:
            score = prefix_len(list(proj.order_by))
            if score > best_score and os.path.isdir(self._projection_path(proj.name)):
                try:
                    cand = self.spark.read.schema(self._storage_schema()).parquet(
                        self._projection_path(proj.name)
                    )
                except Exception:
                    continue
                # projections hold the same raw rows — the engine read
                # semantics (dedup/rollup/collapse) apply to them too, or
                # the two physical copies would answer differently
                best_df, best_score = self._with_engine_semantics(cand), score
        return best_df

    def _rebuild_projections(self) -> None:
        """Re-derive every projection from the (rewritten) base — TTL and
        OPTIMIZE rewrite the base files; stale projections would resurrect
        deleted rows."""
        if not self.config.projections:
            return
        base = self.read_raw()
        for proj in self.config.projections:
            shutil.rmtree(self._projection_path(proj.name), ignore_errors=True)
        self._write_projections(base)

    def optimize(
        self,
        target_files: Optional[int] = None,
        zorder_by: Optional[Sequence[str]] = None,
    ) -> int:
        """Compaction — the explicit counterpart of MergeTree background
        merges (CH merges small parts into sorted bigger ones continuously;
        here OPTIMIZE is a scheduled job, like `OPTIMIZE TABLE ... FINAL`).

        Rewrites the table into `target_files` files, each internally sorted
        by the ORDER BY key, so parquet row-group min/max stats prune range
        scans; partitioned tables keep their partitioning.  Returns the
        file count after compaction.  At 100 TB run per partition (only
        partitions with small-file buildup), never table-wide.

        ``zorder_by=(x, y)`` clusters by the Morton interleave of two
        integer columns instead of the ORDER BY key (the Delta/Iceberg
        OPTIMIZE ZORDER shape, ops/layout.py): every output file then
        covers a small rectangle of BOTH dimensions, so min/max file stats
        prune on either predicate.
        """
        df = self.read_raw()
        n_rows = df.count()
        if target_files is None:
            # ~128MB-file heuristic is meaningless on toy data; default to
            # one file per shuffle partition bounded by row count
            target_files = max(1, min(8, n_rows // 10_000 or 1))
        if zorder_by is not None:
            from moosestack_spark.ops.layout import cluster_by_zorder

            if len(zorder_by) != 2:
                raise ValueError("zorder_by takes exactly two columns")
            # reserved temp column: never clobber a user column (a table
            # column literally named "zorder" would otherwise be silently
            # overwritten and dropped by the rewrite)
            zcol = "__zorder_opt"
            if zcol in df.columns:
                raise ValueError(
                    f"optimize(zorder_by=...): column {zcol!r} is reserved"
                )
            out = cluster_by_zorder(
                df, zorder_by[0], zorder_by[1],
                num_partitions=target_files, out_col=zcol,
            ).drop(zcol)
        elif keys := self._sort_keys():
            out = df.repartitionByRange(target_files, *keys).sortWithinPartitions(*keys)
        else:
            out = df.coalesce(target_files)
        tmp = self.path + ".__optimize_tmp"
        writer = out.write.mode("overwrite")
        for k, v in self._parquet_index_options().items():
            writer = writer.option(k, v)
        if self.config.partition_by:
            writer = writer.partitionBy(self.config.partition_by)
        writer.parquet(tmp)
        shutil.rmtree(self.path, ignore_errors=True)
        os.rename(tmp, self.path)
        self._rebuild_projections()
        self._commit_snapshot("rewrite")
        return sum(
            1
            for root, _, files in os.walk(self.path)
            for f in files
            if f.endswith(".parquet")
        )

    _TTL_RE = r"^\s*(\w+)\s*\+\s*INTERVAL\s+(\d+)\s+(\w+)\s*$"
    _TTL_SECONDS = {
        "SECOND": 1,
        "MINUTE": 60,
        "HOUR": 3600,
        "DAY": 86400,
        "WEEK": 604800,
    }

    def _ttl_cutoff(self, expr: str, now: datetime) -> tuple[str, datetime]:
        m = re.match(self._TTL_RE, expr, re.IGNORECASE)
        if not m:
            raise ValueError(f"unsupported TTL expression: {expr!r}")
        ts_col, n, unit = m.group(1), int(m.group(2)), m.group(3).upper()
        if unit not in self._TTL_SECONDS:
            raise ValueError(f"unsupported TTL unit {unit!r}")
        return ts_col, now - timedelta(seconds=n * self._TTL_SECONDS[unit])

    def apply_column_ttl(self, now: Optional[datetime] = None) -> dict[str, int]:
        """Column-level TTL (ClickHouseTTL annotation, data_models.py:70-72):
        when a column's TTL expression passes, its value resets (NULL here;
        CH resets to the column default).  Returns {column: values_cleared}.
        One rewrite covers all expired columns; at scale run per partition
        like apply_ttl."""
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        ttl_cols = [c for c in self.columns if c.ttl]
        if not ttl_cols:
            return {}
        df = self.read_raw()
        cleared: dict[str, int] = {}
        out = df
        for c in ttl_cols:
            ts_col, cutoff = self._ttl_cutoff(c.ttl, now)
            expired = (F.col(ts_col) <= F.lit(cutoff)) & F.col(c.name).isNotNull()
            cleared[c.name] = df.filter(expired).count()
            out = out.withColumn(
                c.name,
                F.when(F.col(ts_col) <= F.lit(cutoff), F.lit(None)).otherwise(
                    F.col(c.name)
                ),
            )
        if not any(cleared.values()):
            return cleared
        self._rewrite_base(out, ".__colttl_tmp")
        return cleared

    def apply_ttl(self, now: Optional[datetime] = None) -> int:
        """Retention job for the table TTL (ClickHouseTTL data_models.py:70-72;
        TtlChanged infrastructure_map.rs:334-340).  CH deletes expired rows at
        merge time; here it is an explicit scheduled job — a filtered rewrite
        keeping rows within the window.  Returns the number of rows deleted.

        TTL grammar (the subset the reference's templates use):
        ``<ts_column> + INTERVAL <n> <unit>`` — a row expires when
        ts + interval <= now.  At scale: run per partition and skip
        partitions whose max(ts) is inside the window (partition pruning
        makes the rewrite touch only expiring partitions).
        """
        if not self.config.ttl:
            return 0
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        ts_col, cutoff = self._ttl_cutoff(self.config.ttl, now)

        df = self.read_raw()
        total = df.count()
        # NULL TTL timestamps never expire (CH semantics: a NULL TTL
        # expression row is kept) — a bare > predicate would silently
        # delete them
        kept = df.filter(F.col(ts_col).isNull() | (F.col(ts_col) > F.lit(cutoff)))
        n_kept = kept.count()
        if n_kept == total:
            return 0
        self._rewrite_base(kept, ".__ttl_tmp")
        return total - n_kept

    def delete_where(self, predicate: str) -> int:
        """``ALTER TABLE ... DELETE WHERE <predicate>`` (the CH mutation the
        reference issues for data corrections; SQL passthrough surface —
        apps/framework-cli ddl plans treat mutations as data ops, not schema
        diffs).  Deletes rows where the predicate is TRUE; FALSE and NULL
        rows are kept (CH mutation semantics).  Returns rows deleted.

        Scale shape: on a partitioned table only the partitions containing
        matching rows are rewritten (Spark dynamic partition overwrite —
        the direct analogue of CH mutating only parts that contain matching
        rows); untouched partitions are never read or written.  Partitions
        whose rows are ALL deleted are dropped explicitly (dynamic
        overwrite leaves a partition untouched when the frame contains no
        rows for it)."""
        pred = F.expr(predicate)
        df = self.read_raw()
        n_del = df.filter(pred).count()
        if n_del == 0:
            return 0
        keep = ~F.coalesce(pred, F.lit(False))
        pb = self.config.partition_by
        if not pb:
            self._rewrite_base(df.filter(keep), ".__del_tmp")
            return n_del
        affected = self._affected_partition_values(df, pred, pb)
        kept_affected = df.filter(F.col(pb).isin(affected)).filter(keep)
        survivors = {r[0] for r in kept_affected.select(pb).distinct().collect()}
        prev_mode = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            if survivors:
                (
                    kept_affected.localCheckpoint()  # plan reads files the write replaces
                    .write.mode("overwrite")
                    .partitionBy(pb)
                    .parquet(self.path)
                )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        for val in set(affected) - survivors:
            shutil.rmtree(
                os.path.join(self.path, f"{pb}={val}"), ignore_errors=True
            )
        self._rebuild_projections()
        self._commit_snapshot("rewrite")
        return n_del

    def update_where(self, assignments: dict[str, str], predicate: str) -> int:
        """``ALTER TABLE ... UPDATE col = expr WHERE <predicate>`` (the other
        CH mutation; same SQL passthrough surface as delete_where).  Rewrites
        matching rows with the assignment expressions; FALSE/NULL-predicate
        rows are untouched.  Assignment expressions may reference any column
        of the row (CH mutation semantics) and are cast back to the column's
        declared type so the table schema never drifts.  Key columns
        (partition / order-by) cannot be updated — CH rejects mutations on
        key columns, and allowing a partition-column update would silently
        move rows between partitions mid-rewrite.  Returns rows updated.

        Scale shape mirrors delete_where: on a partitioned table only the
        partitions containing matching rows are rewritten via dynamic
        partition overwrite; since UPDATE never removes rows and key columns
        are immutable, no partition can become empty or change its key."""
        if not assignments:
            return 0
        key_cols = set(self.config.order_by_fields or ())
        if self.config.partition_by:
            key_cols.add(self.config.partition_by)
        banned = key_cols & set(assignments)
        if banned:
            raise ValueError(f"cannot UPDATE key column(s): {sorted(banned)}")
        df = self.read_raw()
        unknown = set(assignments) - set(df.columns)
        if unknown:
            raise ValueError(f"unknown column(s) in UPDATE: {sorted(unknown)}")
        pred = F.expr(predicate)
        n_upd = df.filter(pred).count()
        if n_upd == 0:
            return 0
        cond = F.coalesce(pred, F.lit(False))
        types = dict(df.dtypes)

        def _apply(frame: DataFrame) -> DataFrame:
            cols = []
            for c in frame.columns:
                if c in assignments:
                    cols.append(
                        F.when(cond, F.expr(assignments[c]).cast(types[c]))
                        .otherwise(F.col(c))
                        .alias(c)
                    )
                else:
                    cols.append(F.col(c))
            return frame.select(*cols)

        pb = self.config.partition_by
        if not pb:
            self._rewrite_base(_apply(df), ".__upd_tmp")
            return n_upd
        affected = self._affected_partition_values(df, pred, pb)
        updated_affected = _apply(df.filter(F.col(pb).isin(affected)))
        prev_mode = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                updated_affected.localCheckpoint()  # plan reads files the write replaces
                .write.mode("overwrite")
                .partitionBy(pb)
                .parquet(self.path)
            )
        finally:
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", prev_mode
            )
        self._rebuild_projections()
        self._commit_snapshot("rewrite")
        return n_upd

    # Mutations collect the distinct partition values a predicate touches so
    # dynamic-overwrite only rewrites those partitions.  On a sane layout
    # that is bounded by partition count; a table partitioned by a
    # high-cardinality column would turn this into an unbounded driver
    # collect, so count in-plan first and refuse loudly above this cap.
    MUTATION_PARTITION_CAP = 100_000

    def _affected_partition_values(self, df: DataFrame, pred, pb: str) -> list:
        """Distinct ``pb`` values among rows matching ``pred``, guarded by
        MUTATION_PARTITION_CAP (count runs in-plan; the collect only happens
        once the cardinality is known to be bounded)."""
        distinct_vals = df.filter(pred).select(pb).distinct()
        n = distinct_vals.count()
        if n > self.MUTATION_PARTITION_CAP:
            raise ValueError(
                f"mutation touches {n} distinct '{pb}' partition values "
                f"(cap {self.MUTATION_PARTITION_CAP}); partitioning by a "
                "high-cardinality column makes per-partition rewrite "
                "driver-unbounded — repartition the table or widen the "
                "predicate to full-table rewrite"
            )
        return [r[0] for r in distinct_vals.collect()]

    def _rewrite_base(self, df: DataFrame, tmp_suffix: str) -> None:
        """Atomically replace the base files with ``df``, preserving the
        table's partition layout.  TTL rewrites previously wrote flat files;
        on a partitioned table the next _append_df then writes key=value
        subdirs and reads of the mixed layout silently drop the partitioned
        rows — every base rewrite must go through the same partitionBy as
        _append_df/optimize."""
        tmp = self.path + tmp_suffix
        writer = df.write.mode("overwrite")
        for k, v in self._parquet_index_options().items():
            writer = writer.option(k, v)
        if self.config.partition_by:
            writer = writer.partitionBy(self.config.partition_by)
        writer.parquet(tmp)
        shutil.rmtree(self.path, ignore_errors=True)
        os.rename(tmp, self.path)
        self._rebuild_projections()
        self._commit_snapshot("rewrite")
