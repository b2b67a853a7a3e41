"""Time-series downsampling: largestTriangleThreeBuckets (LTTB).

ClickHouse parity (SURVEY.md §2.4): CH ships
``largestTriangleThreeBuckets(n)(x, y)`` (Steinarsson 2013) for
visualization-grade downsampling that preserves the visual shape of a
series.  LTTB is inherently sequential per series (each bucket's pick
depends on the previous pick), so it cannot be a plain SQL aggregate —
this is exactly the applyInPandas case: one Arrow-batched Python kernel
per series key, parallel ACROSS keys, sequential WITHIN a key.

Scale: the shuffle is one groupBy on the series key; per-key state is the
key's own series (a dashboard series is thousands-to-millions of points —
fits one task; for monster single series, pre-aggregate to per-minute
means first, which is the standard practice and keeps LTTB O(n) on a
bounded n).

Determinism: ties in the triangle-area comparison are broken by FIRST
index (strict >), so repeated runs and any partitioning give identical
output; registered rows-only (sequential-greedy is not SQL-expressible)
with a pytest pinning the kernel against an independent reference
implementation plus endpoint/count/subset invariants.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moosestack_spark.registry import query

THRESHOLD = 20


def lttb_select(x: np.ndarray, y: np.ndarray, threshold: int) -> np.ndarray:
    """Indices of the LTTB-selected points of (x, y), x ascending.
    Always keeps the first and last point; returns all indices when the
    series is shorter than the threshold."""
    n = len(x)
    if threshold >= n or threshold < 3:
        return np.arange(n)
    # bucket boundaries over the interior points [1, n-1)
    edges = np.linspace(1, n - 1, threshold - 1).astype(np.int64)
    out = [0]
    prev = 0
    for b in range(threshold - 2):
        lo, hi = edges[b], edges[b + 1]
        # average of the NEXT bucket (or the last point for the final bucket)
        nlo, nhi = (edges[b + 1], edges[b + 2]) if b + 2 < len(edges) else (n - 1, n)
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        ax, ay = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        px, py = x[prev], y[prev]
        # triangle area vs (prev, candidate, next-bucket average)
        areas = np.abs(
            (px - ax) * (y[lo:hi] - py) - (px - x[lo:hi]) * (ay - py)
        )
        prev = lo + int(np.argmax(areas))  # argmax: first index wins ties
        out.append(prev)
    out.append(n - 1)
    return np.asarray(out, dtype=np.int64)


def lttb(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    threshold: int,
) -> DataFrame:
    """Per-key LTTB downsample to at most ``threshold`` points.  One
    shuffle on the key; the kernel sorts each series by (x, y) and emits
    the selected points with their rank."""

    schema = f"{key_col} long, sel_rank int, {x_col} long, {y_col} double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort")
        x = pdf[x_col].to_numpy(np.int64)
        y = pdf[y_col].to_numpy(np.float64)
        idx = lttb_select(x, y, threshold)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[idx].to_numpy(),
                "sel_rank": np.arange(len(idx), dtype=np.int32),
                x_col: x[idx],
                y_col: y[idx],
            }
        )

    return df.select(key_col, x_col, y_col).groupBy(key_col).applyInPandas(
        kernel, schema
    )


@query("agg_lttb_downsample")  # sequential-greedy: rows-only driver check
def agg_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """largestTriangleThreeBuckets(20) over each user's (ts, value) event
    series: the CH visualization aggregate as a per-key Arrow kernel.
    Rows-only by design; pytest (test_downsample.py) pins the kernel
    against an independent reference implementation and the
    endpoint/count/subset invariants."""
    from moosestack_spark.tables import t

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("x"),
        F.col("value").alias("y"),
    )
    return lttb(ev, "user_id", "x", "y", THRESHOLD)
