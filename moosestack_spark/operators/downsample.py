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


# --------------------------------------------------------------------------
# Exact-integer LTTB — the HARD-GATED variant.  Coordinates are integers
# (x: epoch micros; y: value scaled to cents with floor(v*100 + 0.5) — a
# deterministic function of the stored double both engines compute
# identically), bucket edges are integer arithmetic (1 + (b*(n-2)) //
# (threshold-2), the linspace floor without float truncation hazards), and
# the triangle-area argmax is computed on EXACT integers by multiplying
# through by the next-bucket count: area*cnt = |(px*cnt - sx)*(yi - py) -
# (px - xi)*(sy - py*cnt)| — unbounded Python ints in the kernel, HUGEINT
# in the DuckDB replay, zero float decisions anywhere.  The float
# lttb_select above stays the general API; this is what lets a
# sequential-greedy algorithm carry a value-hash oracle (a recursive CTE
# replays the per-bucket selection chain).
# --------------------------------------------------------------------------


def lttb_select_exact(x: list, y: list, threshold: int) -> list:
    """Indices of the exact-integer LTTB selection (x ascending, int x/y)."""
    n = len(x)
    if threshold >= n or threshold < 3:
        return list(range(n))
    d = threshold - 2

    def edge(i: int) -> int:
        return 1 + (i * (n - 2)) // d

    out = [0]
    prev = 0
    for b in range(d):
        lo, hi = edge(b), edge(b + 1)
        if b + 2 <= d:
            nlo, nhi = edge(b + 1), edge(b + 2)
        else:
            nlo, nhi = n - 1, n
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        cnt = nhi - nlo
        sx = sum(x[nlo:nhi])
        sy = sum(y[nlo:nhi])
        px, py = x[prev], y[prev]
        best, best_area = lo, -1
        for i in range(lo, hi):
            area = abs(
                (px * cnt - sx) * (y[i] - py) - (px - x[i]) * (sy - py * cnt)
            )
            if area > best_area:
                best, best_area = i, area
        out.append(best)
        prev = best
    out.append(n - 1)
    return out


def lttb_exact(
    df: DataFrame, key_col: str, x_col: str, y_col: str, threshold: int
) -> DataFrame:
    """Per-key exact-integer LTTB (int x and y columns)."""
    schema = f"{key_col} long, sel_rank int, {x_col} long, {y_col} long"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([x_col, y_col], kind="mergesort")
        x = [int(v) for v in pdf[x_col]]
        y = [int(v) for v in pdf[y_col]]
        idx = lttb_select_exact(x, y, threshold)
        return pd.DataFrame(
            {
                key_col: pdf[key_col].iloc[idx].to_numpy(),
                "sel_rank": np.arange(len(idx), dtype=np.int32),
                x_col: [x[i] for i in idx],
                y_col: [y[i] for i in idx],
            }
        )

    return df.select(key_col, x_col, y_col).groupBy(key_col).applyInPandas(
        kernel, schema
    )


def _lttb_oracle(threshold: int = THRESHOLD) -> str:
    """Recursive-CTE replay of the exact-integer selection chain."""
    d = threshold - 2
    # integer bucket edges as SQL in s.b / s.n
    lo = f"(1 + (s.b * (s.n - 2)) // {d})"
    hi = f"(1 + ((s.b + 1) * (s.n - 2)) // {d})"
    nhi0 = f"(1 + ((s.b + 2) * (s.n - 2)) // {d})"
    use_next = f"(s.b + 2 <= {d} AND {nhi0} > {hi})"
    nlo = f"(CASE WHEN {use_next} THEN {hi} ELSE s.n - 1 END)"
    nhi = f"(CASE WHEN {use_next} THEN {nhi0} ELSE s.n END)"
    px = "(SELECT t.x FROM pts t WHERE t.user_id = s.user_id AND t.i = s.prev)"
    py = "(SELECT t.y FROM pts t WHERE t.user_id = s.user_id AND t.i = s.prev)"
    cnt = (
        f"(SELECT COUNT(*) FROM pts t WHERE t.user_id = s.user_id "
        f"AND t.i >= {nlo} AND t.i < {nhi})"
    )
    sx = (
        f"(SELECT SUM(t.x) FROM pts t WHERE t.user_id = s.user_id "
        f"AND t.i >= {nlo} AND t.i < {nhi})"
    )
    sy = (
        f"(SELECT SUM(t.y) FROM pts t WHERE t.user_id = s.user_id "
        f"AND t.i >= {nlo} AND t.i < {nhi})"
    )
    area = (
        f"ABS((CAST({px} AS HUGEINT) * {cnt} - {sx}) * (p.y - {py}) "
        f"- ({px} - p.x) * (CAST({sy} AS HUGEINT) - CAST({py} AS HUGEINT) * {cnt}))"
    )
    pick = f"""(
      SELECT p.i FROM pts p
      WHERE p.user_id = s.user_id AND p.i >= {lo} AND p.i < {hi}
      ORDER BY {area} DESC, p.i ASC
      LIMIT 1
    )"""
    return f"""
WITH RECURSIVE pts AS (
  SELECT user_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY x, y) - 1
              AS BIGINT) AS i,
         x, y
  FROM (
    SELECT user_id, epoch_us(ts) AS x,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
  )
),
ns AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM pts GROUP BY user_id),
sel AS (
  SELECT user_id, 0 AS b, CAST(0 AS BIGINT) AS prev, n
  FROM ns WHERE n > {threshold}
  UNION ALL
  SELECT s.user_id, s.b + 1, {pick} AS prev, s.n
  FROM sel s WHERE s.b < {d}
),
big_out AS (
  SELECT s.user_id, CAST(s.b AS INT) AS sel_rank, p.x, p.y
  FROM sel s JOIN pts p ON p.user_id = s.user_id AND p.i = s.prev
  UNION ALL
  SELECT n2.user_id, CAST({threshold - 1} AS INT) AS sel_rank, p.x, p.y
  FROM ns n2 JOIN pts p ON p.user_id = n2.user_id AND p.i = n2.n - 1
  WHERE n2.n > {threshold}
),
small_out AS (
  SELECT p.user_id, CAST(p.i AS INT) AS sel_rank, p.x, p.y
  FROM pts p JOIN ns USING (user_id) WHERE ns.n <= {threshold}
)
SELECT user_id, sel_rank, x, y_cents FROM (
  SELECT user_id, sel_rank, x, y AS y_cents FROM big_out
  UNION ALL
  SELECT user_id, sel_rank, x, y AS y_cents FROM small_out
)
"""


@query("agg_lttb_downsample", oracle=_lttb_oracle())
def agg_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """largestTriangleThreeBuckets(20) over each user's (ts, cents) event
    series — HARD-oracled: the exact-integer variant (integer edges,
    count-scaled integer areas) lets a DuckDB recursive CTE replay the
    greedy per-bucket selection chain value-exactly.  The float-coordinate
    kernel (lttb/lttb_select) remains the general API, pinned against an
    independent reference in test_downsample.py."""
    from moosestack_spark.tables import t

    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("x"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y_cents"),
    )
    return lttb_exact(ev, "user_id", "x", "y_cents", THRESHOLD)
