"""Native Delta Lake table reader/writer — pure python transaction-log
replay, Spark parquet scan, no delta-spark jars.

Companion to catalog/iceberg_native.py for the other ubiquitous lake
format.  Implements the public Delta transaction protocol
(github.com/delta-io/delta PROTOCOL.md) subset a reader needs:

- ``_delta_log/<version>.json`` commits: newline-delimited actions
  (protocol / metaData / add / remove / commitInfo);
- snapshot construction by replaying adds minus removes up to a version
  (time travel = stop early);
- ``_last_checkpoint`` + ``<version>.checkpoint.parquet`` (read via Spark,
  so checkpoint scanning is executor-side);
- partition pruning on ``add.partitionValues`` before any file is opened;
- data scan via ``spark.read.option("basePath", ...).parquet(<files>)`` —
  Delta data files do NOT carry partition columns in-file (Hive-style
  dirs), and basePath reconstructs them.

Honest boundaries (raise, never silently wrong): deletion vectors, column
mapping, generated columns, reader protocol version > 1 features.

The writer emits protocol-shaped commits (and optional checkpoints) so
tables can be planted, appended, and time-traveled in tests/gates.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


def _spark_type_name(dt: str) -> str:
    return {
        "bigint": "long",
        "int": "integer",
        "double": "double",
        "float": "float",
        "string": "string",
        "boolean": "boolean",
        "date": "date",
        "timestamp": "timestamp",
    }.get(dt, dt)


class DeltaNativeTable:
    PARTITION_CAP = 10_000  # same discipline as the Iceberg writer

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, "_delta_log")

    # -- log inspection ------------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(m.group(1))
            for f in os.listdir(self.log_dir)
            if (m := _LOG_RE.match(f))
        )

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no Delta log under {self.log_dir}")
        return vs[-1]

    def _actions(self, version: int) -> list[dict]:
        out = []
        with open(os.path.join(self.log_dir, f"{version:020d}.json")) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        return out

    # -- snapshot construction ----------------------------------------------

    def snapshot(self, version: int | None = None) -> tuple[dict, dict[str, dict]]:
        """-> (metaData action, {relative path: add action}) at ``version``
        (default latest).  Prefers the newest checkpoint at or below the
        requested version, then replays the JSON tail."""
        target = version if version is not None else self.latest_version()
        if target not in self.versions():
            raise ValueError(
                f"Delta version {target} not found; have {self.versions()}"
            )
        meta: dict | None = None
        files: dict[str, dict] = {}
        start = 0
        ckpt = self._checkpoint_at_or_below(target)
        if ckpt is not None:
            ckpt_version, ckpt_path = ckpt
            for row in self.spark.read.parquet(ckpt_path).collect():
                d = row.asDict(recursive=True)
                md, add = d.get("metaData"), d.get("add")
                # this writer's checkpoints store actions as JSON strings
                # (see write_checkpoint); decode symmetrically
                if md is not None:
                    meta = json.loads(md) if isinstance(md, str) else md
                if add is not None:
                    add = json.loads(add) if isinstance(add, str) else add
                    files[add["path"]] = add
            start = ckpt_version + 1
        for v in range(start, target + 1):
            if v not in self.versions():
                continue
            for action in self._actions(v):
                if "protocol" in action:
                    p = action["protocol"]
                    if p.get("minReaderVersion", 1) > 1:
                        raise NotImplementedError(
                            f"Delta reader protocol {p['minReaderVersion']} "
                            "(deletion vectors / column mapping) unsupported"
                        )
                if "metaData" in action:
                    meta = action["metaData"]
                if "add" in action:
                    files[action["add"]["path"]] = action["add"]
                if "remove" in action:
                    files.pop(action["remove"]["path"], None)
        if meta is None:
            raise ValueError("Delta log has no metaData action")
        return meta, files

    def _checkpoint_at_or_below(self, version: int) -> tuple[int, str] | None:
        best = None
        for f in os.listdir(self.log_dir):
            m = _CKPT_RE.match(f)
            if m and int(m.group(1)) <= version:
                if best is None or int(m.group(1)) > best[0]:
                    best = (int(m.group(1)), os.path.join(self.log_dir, f))
        return best

    # -- read ----------------------------------------------------------------

    def read(
        self,
        version: int | None = None,
        partition_filter: dict | None = None,
    ) -> DataFrame:
        meta, files = self.snapshot(version)
        part_cols = meta.get("partitionColumns", [])
        for k in partition_filter or {}:
            if k not in part_cols:
                raise ValueError(
                    f"{k!r} is not a partition column (have {part_cols})"
                )
        chosen = []
        for rel, add in files.items():
            pv = add.get("partitionValues", {})
            if partition_filter and any(
                pv.get(k) != str(v) for k, v in partition_filter.items()
            ):
                continue  # pruned before the file is ever opened
            chosen.append(os.path.join(self.path, rel))
        if not chosen:
            schema = json.loads(meta["schemaString"])
            cols = ", ".join(
                f"CAST(NULL AS {_delta_to_sql(f['type'])}) AS {f['name']}"
                for f in schema["fields"]
            )
            return self.spark.sql(f"SELECT {cols}").limit(0)
        out = self.spark.read.option("basePath", self.path).parquet(*chosen)
        # Spark's partition-dir discovery type-infers values (a "2" dir
        # becomes INT); Delta's schemaString is authoritative — cast the
        # partition columns back to their declared types
        schema = json.loads(meta["schemaString"])
        declared = {f["name"]: _delta_to_sql(f["type"]) for f in schema["fields"]}
        for c in part_cols:
            if c in declared and c in out.columns:
                out = out.withColumn(c, F.col(c).cast(declared[c]))
        return out

    # -- write ---------------------------------------------------------------

    @classmethod
    def write(
        cls,
        df: DataFrame,
        path: str,
        partition_by: str | None = None,
        mode: str = "overwrite",
        checkpoint: bool = False,
    ) -> "DeltaNativeTable":
        """Commit ``df`` as a new Delta version.  overwrite on an existing
        table emits remove actions for every live file first (the protocol
        shape of INSERT OVERWRITE); append only adds.  ``checkpoint``
        additionally writes a <version>.checkpoint.parquet + _last_checkpoint."""
        spark = df.sparkSession
        table = cls(spark, path)
        os.makedirs(table.log_dir, exist_ok=True)
        existing = table.versions()
        version = (existing[-1] + 1) if existing else 0
        if mode not in ("overwrite", "append"):
            raise ValueError(f"mode must be overwrite|append, got {mode!r}")

        actions: list[dict] = []
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
            )
        removes: list[dict] = []
        if mode == "overwrite" and existing:
            _, live = table.snapshot()
            removes = [
                {"remove": {"path": rel, "dataChange": True}} for rel in live
            ]

        schema_fields = [
            {
                "name": n,
                "type": _spark_type_name(dt),
                "nullable": True,
                "metadata": {},
            }
            for n, dt in df.dtypes
        ]
        meta_action = {
            "metaData": {
                "id": f"native-{os.path.basename(path)}",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(
                    {"type": "struct", "fields": schema_fields}
                ),
                "partitionColumns": [partition_by] if partition_by else [],
                "configuration": {},
            }
        }

        batch = f"b{version}"
        adds: list[dict] = []
        if partition_by:
            values = [r[0] for r in df.select(partition_by).distinct().collect()]
            if len(values) > cls.PARTITION_CAP:
                raise ValueError(
                    f"{len(values)} distinct partition values (cap "
                    f"{cls.PARTITION_CAP})"
                )
            for v in sorted(values, key=str):
                rel_dir = f"{partition_by}={v}"
                out_dir = os.path.join(path, rel_dir, batch)
                # delta data files do NOT contain partition columns
                df.filter(F.col(partition_by) == F.lit(v)).drop(
                    partition_by
                ).write.mode("overwrite").parquet(out_dir)
                adds.extend(
                    cls._adds_for_dir(path, out_dir, {partition_by: str(v)})
                )
        else:
            out_dir = os.path.join(path, batch)
            df.write.mode("overwrite").parquet(out_dir)
            adds = cls._adds_for_dir(path, out_dir, {})

        actions.append(meta_action)
        actions.extend(removes)
        actions.extend(adds)
        actions.append(
            {
                "commitInfo": {
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode},
                }
            }
        )
        log_path = os.path.join(table.log_dir, f"{version:020d}.json")
        tmp = log_path + ".tmp"
        with open(tmp, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
        os.replace(tmp, log_path)
        if checkpoint:
            table.write_checkpoint(version)
        return table

    @classmethod
    def _adds_for_dir(cls, root: str, out_dir: str, pv: dict) -> list[dict]:
        adds = []
        for f in sorted(os.listdir(out_dir)):
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(out_dir, f)
            adds.append(
                {
                    "add": {
                        "path": os.path.relpath(fp, root),
                        "partitionValues": pv,
                        "size": os.path.getsize(fp),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
        return adds

    def write_checkpoint(self, version: int | None = None) -> str:
        """Materialize the snapshot at ``version`` as a checkpoint parquet
        + _last_checkpoint pointer (readers then skip the JSON prefix)."""
        v = version if version is not None else self.latest_version()
        meta, files = self.snapshot(v)
        rows = [{"metaData": meta, "add": None}] + [
            {"metaData": None, "add": add} for add in files.values()
        ]
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "metaData": [json.dumps(r["metaData"]) if r["metaData"] else None for r in rows],
                "add": [json.dumps(r["add"]) if r["add"] else None for r in rows],
            }
        )
        # store the actions as JSON strings inside the checkpoint (decoded
        # symmetrically in snapshot()) — a simplification of the struct
        # checkpoint layout, documented here and in snapshot()
        sdf = self.spark.createDataFrame(pdf)
        ckpt_dir = os.path.join(self.log_dir, f"__ckpt_{v}")
        sdf.coalesce(1).write.mode("overwrite").parquet(ckpt_dir)
        part = [f for f in os.listdir(ckpt_dir) if f.endswith(".parquet")][0]
        final = os.path.join(self.log_dir, f"{v:020d}.checkpoint.parquet")
        os.replace(os.path.join(ckpt_dir, part), final)
        import shutil

        shutil.rmtree(ckpt_dir, ignore_errors=True)
        with open(os.path.join(self.log_dir, "_last_checkpoint"), "w") as fh:
            json.dump({"version": v, "size": len(rows)}, fh)
        return final


def _delta_to_sql(t) -> str:
    if isinstance(t, dict):
        return "STRING"
    return {
        "long": "BIGINT",
        "integer": "INT",
        "double": "DOUBLE",
        "float": "FLOAT",
        "string": "STRING",
        "boolean": "BOOLEAN",
        "date": "DATE",
        "timestamp": "TIMESTAMP",
    }.get(t, "STRING")
