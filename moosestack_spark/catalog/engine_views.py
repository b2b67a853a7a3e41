"""MergeTree-engine read semantics as deterministic dedup/agg-on-read views.

The reference maps each table to a ClickHouse engine whose merge-time
semantics (dedup, summation, sign-collapse) are EVENTUAL — queries may see
pre-merge duplicates (py-moose-lib/moose_lib/blocks.py:8-116 defines the
engine configs; DDL emission apps/framework-cli/src/.../queries.rs:3097+).

Spark-first mapping (SURVEY.md §1.4): storage is append-only Parquet; the
engine semantics are applied AT READ TIME, deterministically — strictly more
consistent than ClickHouse's merge-eventually behavior.

Scale notes: every view here is one shuffle on the engine's key columns
(window or groupBy), the same cost ClickHouse pays at merge; at 100 TB the
key-partitioned window scales out per key-group and AQE splits skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def replacing_latest(
    df: DataFrame,
    keys: Sequence[str],
    version_col: Optional[str] = None,
    is_deleted_col: Optional[str] = None,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """ReplacingMergeTree(ver[, is_deleted]) read view (blocks.py:51-64).

    Keep one row per key: the max `version_col` (insert order is not
    observable in Parquet, so a version column — or explicit tiebreakers —
    is required for determinism).  Rows whose surviving version has
    is_deleted=1 are dropped (tombstone semantics).
    """
    order = []
    if version_col:
        order.append(F.col(version_col).desc())
    for tb in tiebreakers:
        order.append(F.col(tb).desc())
    if not order:
        raise ValueError(
            "replacing_latest needs version_col or tiebreakers for a "
            "deterministic survivor (Parquet has no insert-order)"
        )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if is_deleted_col:
        out = out.filter(F.col(is_deleted_col) == 0)
    return out


def summing_rollup(
    df: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """SummingMergeTree(columns) read view (blocks.py:75-82): rows with equal
    key summed; non-key non-sum columns are dropped (CH keeps an arbitrary
    value for them — we drop rather than expose nondeterminism)."""
    aggs = [F.sum(F.col(c)).alias(c) for c in sum_cols]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def collapsing_resolve(
    df: DataFrame, keys: Sequence[str], sign_col: str
) -> DataFrame:
    """CollapsingMergeTree(sign) read view (blocks.py:86-97).

    Pairs of (+1, -1) rows with the same key cancel; a key whose signs sum to
    +1 keeps its +1 state row, 0 means fully cancelled.  Without a version
    column CH keeps the LAST +1 row (insert order — unobservable in
    Parquet); the deterministic emulation keeps keys with sum(sign) > 0 and
    attaches the struct-max +1 payload row (content-ordered survivor), with
    sign surfaced as +1.
    """
    payload = [c for c in df.columns if c not in keys and c != sign_col]
    survivors = (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.sum(F.col(sign_col)).alias("__net"))
        .filter(F.col("__net") > 0)
        .drop("__net")
    )
    if not payload:
        return survivors.withColumn(sign_col, F.lit(1))
    latest = (
        df.filter(F.col(sign_col) == 1)
        .groupBy(*[F.col(k) for k in keys])
        .agg(F.max(F.struct(*[F.col(c) for c in payload])).alias("__p"))
    )
    return (
        survivors.join(latest, list(keys), "inner")
        .select(
            *[F.col(k) for k in keys],
            F.lit(1).alias(sign_col),
            *[F.col(f"__p.{c}").alias(c) for c in payload],
        )
    )


def versioned_collapsing_resolve(
    df: DataFrame, keys: Sequence[str], sign_col: str, version_col: str
) -> DataFrame:
    """VersionedCollapsingMergeTree (blocks.py:101-116): the survivor is the
    +1 row with the max version whose cancellation (-1 at same version) has
    not arrived."""
    payload = [
        c for c in df.columns if c not in keys and c not in (sign_col, version_col)
    ]
    per_version = (
        df.groupBy(*[F.col(k) for k in keys], F.col(version_col))
        .agg(F.sum(F.col(sign_col)).alias("__net"))
        .filter(F.col("__net") > 0)
    )
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(version_col).desc())
    winners = (
        per_version.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__net")
    )
    if not payload:
        return winners.withColumn(sign_col, F.lit(1))
    latest = (
        df.filter(F.col(sign_col) == 1)
        .groupBy(*[F.col(k) for k in keys], F.col(version_col))
        .agg(F.max(F.struct(*[F.col(c) for c in payload])).alias("__p"))
    )
    return (
        winners.join(latest, [*keys, version_col], "inner")
        .select(
            *[F.col(k) for k in keys],
            F.col(version_col),
            F.lit(1).alias(sign_col),
            *[F.col(f"__p.{c}").alias(c) for c in payload],
        )
    )


def aggregate_condition(cond: Column, value: Column) -> Column:
    """CH `xIf` combinator building block: value where cond else NULL."""
    return F.when(cond, value)
