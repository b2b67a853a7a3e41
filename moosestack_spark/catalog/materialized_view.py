"""Incremental materialized views (SURVEY.md §4.2 — the one feature needing
real design).

Reference semantics: a ClickHouse MV runs its SELECT over each inserted
block and appends to a target AggregatingMergeTree table whose
AggregateFunction columns hold partial states ('-State'); reads merge them
via '-Merge' (py-moose-lib/moose_lib/dmv2/materialized_view.py:57-151;
sqlHelpers.ts:195-211 auto-rewrites state columns to fnMerge(col)).

Spark-first decision (SURVEY.md §7 hard part 1): Spark has no stable
serialized partial-agg-state type, so the maintained table stores
**composable finished values** per group:

  count/count_if -> bigint, merged by SUM
  sum            -> exact decimal, merged by SUM
  min/max        -> merged by MIN/MAX
  avg            -> maintained as (sum, count) pair, finalized sum/count

The '-Merge' rewrite of the reference's query layer becomes a plain column
read (avg: one final division).  Query results are identical; only the
storage representation differs.

Each ``refresh(batch)`` is: partial-aggregate the new block (map-side
combine, one shuffle on the group keys), then merge with the maintained
state by unioning and re-aggregating — O(|state| + |batch|) per refresh,
never a rescan of history.  At 100 TB the state table is partitioned by the
group keys; in streaming mode the same merge runs inside foreachBatch.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(25,4)"


@dataclass(frozen=True)
class AggSpec:
    """One maintained aggregate: kind in {count, count_if, sum, min, max, avg}.

    ``expr`` is the source Column (None for count); count_if uses ``cond``.
    """

    name: str
    kind: str
    expr: Optional[Column] = None
    cond: Optional[Column] = None

    def partial_columns(self) -> list[Column]:
        """Aggregates computed over an inserted block."""
        if self.kind == "count":
            return [F.count(F.lit(1)).alias(self.name)]
        if self.kind == "count_if":
            return [F.count_if(self.cond).alias(self.name)]
        if self.kind == "sum":
            return [F.sum(self.expr.cast(DEC)).cast(DEC).alias(self.name)]
        if self.kind == "min":
            return [F.min(self.expr).alias(self.name)]
        if self.kind == "max":
            return [F.max(self.expr).alias(self.name)]
        if self.kind == "avg":
            return [
                F.sum(self.expr.cast(DEC)).cast(DEC).alias(f"__{self.name}_sum"),
                F.count(self.expr).alias(f"__{self.name}_cnt"),
            ]
        raise ValueError(f"unsupported aggregate kind {self.kind!r}")

    def merge_columns(self) -> list[Column]:
        """Re-aggregation merging maintained state with a new partial."""
        if self.kind in ("count", "count_if"):
            return [F.sum(F.col(self.name)).cast("bigint").alias(self.name)]
        if self.kind == "sum":
            return [F.sum(F.col(self.name)).cast(DEC).alias(self.name)]
        if self.kind == "min":
            return [F.min(F.col(self.name)).alias(self.name)]
        if self.kind == "max":
            return [F.max(F.col(self.name)).alias(self.name)]
        if self.kind == "avg":
            return [
                F.sum(F.col(f"__{self.name}_sum")).cast(DEC).alias(f"__{self.name}_sum"),
                F.sum(F.col(f"__{self.name}_cnt")).cast("bigint").alias(f"__{self.name}_cnt"),
            ]
        raise ValueError(self.kind)

    def final_columns(self) -> list[Column]:
        """Read-time projection ('-Merge' equivalent — a plain read)."""
        if self.kind == "sum":
            return [F.col(self.name).cast("double").alias(self.name)]
        if self.kind == "avg":
            return [
                (
                    F.col(f"__{self.name}_sum").cast("double")
                    / F.col(f"__{self.name}_cnt")
                ).alias(self.name)
            ]
        return [F.col(self.name)]


class IncrementalAggregateView:
    """MaterializedView with AggregatingMergeTree semantics, finished-value
    storage, per-block incremental refresh."""

    def __init__(self, group_keys: Sequence[str], aggs: Sequence[AggSpec]):
        self.group_keys = list(group_keys)
        self.aggs = list(aggs)
        self.state: Optional[DataFrame] = None

    def _partial(self, block: DataFrame) -> DataFrame:
        cols: list[Column] = []
        for a in self.aggs:
            cols.extend(a.partial_columns())
        return block.groupBy(*[F.col(k) for k in self.group_keys]).agg(*cols)

    def refresh(self, block: DataFrame) -> "IncrementalAggregateView":
        """Fold one inserted block into the maintained state (the per-insert
        MV computation of materialized_view.py:57-151)."""
        partial = self._partial(block)
        if self.state is None:
            self.state = partial
        else:
            merged_cols: list[Column] = []
            for a in self.aggs:
                merged_cols.extend(a.merge_columns())
            self.state = (
                self.state.unionByName(partial)
                .groupBy(*[F.col(k) for k in self.group_keys])
                .agg(*merged_cols)
            )
        return self

    def checkpoint(self, path: str) -> "IncrementalAggregateView":
        """Persist maintained state (in production: the MV target table)."""
        assert self.state is not None, "refresh() before checkpoint()"
        self.state.write.mode("overwrite").parquet(path)
        spark = self.state.sparkSession
        self.state = spark.read.parquet(path)
        return self

    def read(self) -> DataFrame:
        """Finalized view — what the reference's '-Merge' rewrite reads."""
        assert self.state is not None, "empty materialized view"
        cols: list[Column] = [F.col(k) for k in self.group_keys]
        for a in self.aggs:
            cols.extend(a.final_columns())
        return self.state.select(*cols)

    def populate(self, full: DataFrame) -> "IncrementalAggregateView":
        """Initial backfill (blocks.py:776-780 INSERT INTO target SELECT)."""
        self.state = self._partial(full)
        return self


class IncrementalJoinView:
    """Materialized two-source JOIN maintained under append-only inserts to
    EITHER side via the delta rule: for inserts dA, dB,

        d(A ⋈ B) = dA ⋈ B_old  ∪  A_old ⋈ dB  ∪  dA ⋈ dB

    — the join-MV counterpart of IncrementalAggregateView (the reference
    materializes join-shaped views by re-running the SELECT per inserted
    block against the already-loaded tables; same contract, reference
    packages/py-moose-lib MaterializedView SELECT-over-block semantics).

    Scale shape (100 TB): each refresh joins only the DELTA against the
    accumulated other side (one shuffle on the join key per term; the
    dA ⋈ dB term is delta-sized on both sides).  Retained state is the two
    input relations partitioned on the join key — exactly the state a
    stream-stream join keeps; localCheckpoint truncates the per-refresh
    lineage so the plan never re-derives old batches."""

    def __init__(self, on: Sequence[str]):
        self.on = list(on)
        self._a: Optional[DataFrame] = None
        self._b: Optional[DataFrame] = None
        self._out: Optional[DataFrame] = None

    @staticmethod
    def _union(acc: Optional[DataFrame], d: DataFrame) -> DataFrame:
        return d if acc is None else acc.unionByName(d)

    def refresh(
        self,
        da: Optional[DataFrame] = None,
        db: Optional[DataFrame] = None,
    ) -> "IncrementalJoinView":
        """Fold one inserted block per side (either may be None)."""
        parts: list[DataFrame] = []
        if da is not None and self._b is not None:
            parts.append(da.join(self._b, self.on))
        if db is not None and self._a is not None:
            parts.append(self._a.join(db, self.on))
        if da is not None and db is not None:
            parts.append(da.join(db, self.on))
        for p in parts:
            self._out = self._union(self._out, p)
        if da is not None:
            self._a = self._union(self._a, da).localCheckpoint()
        if db is not None:
            self._b = self._union(self._b, db).localCheckpoint()
        if self._out is not None:
            self._out = self._out.localCheckpoint()
        return self

    def read(self) -> DataFrame:
        assert self._out is not None, "empty materialized join view"
        return self._out

    def populate(self, full_a: DataFrame, full_b: DataFrame) -> "IncrementalJoinView":
        """One-shot backfill; subsequent refresh() calls stay incremental."""
        self._a = full_a.localCheckpoint()
        self._b = full_b.localCheckpoint()
        self._out = full_a.join(full_b, self.on).localCheckpoint()
        return self
