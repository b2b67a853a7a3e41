"""LTTB downsampling invariants + independent reference comparison."""

from __future__ import annotations

import numpy as np

from moosestack_spark.operators.downsample import lttb, lttb_select, lttb_select_exact


def reference_lttb(x, y, threshold):
    """Straightforward per-point reference (Steinarsson 2013, alg. 1) —
    written independently of the numpy kernel."""
    n = len(x)
    if threshold >= n or threshold < 3:
        return list(range(n))
    edges = np.linspace(1, n - 1, threshold - 1).astype(int)
    picked = [0]
    prev = 0
    for b in range(threshold - 2):
        lo, hi = edges[b], edges[b + 1]
        if b + 2 < len(edges):
            nlo, nhi = edges[b + 1], edges[b + 2]
        else:
            nlo, nhi = n - 1, n
        if nhi <= nlo:
            nlo, nhi = n - 1, n
        ax = sum(x[nlo:nhi]) / (nhi - nlo)
        ay = sum(y[nlo:nhi]) / (nhi - nlo)
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs(
                (x[prev] - ax) * (y[i] - y[prev])
                - (x[prev] - x[i]) * (ay - y[prev])
            )
            if area > best_area:
                best, best_area = i, area
        picked.append(best)
        prev = best
    picked.append(n - 1)
    return picked


def test_lttb_matches_reference():
    rng = np.random.default_rng(7)
    for n, threshold in [(100, 10), (1000, 50), (57, 20), (19, 20), (3, 3)]:
        x = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
        y = rng.normal(size=n)
        got = lttb_select(x, y, threshold).tolist()
        want = reference_lttb(x.tolist(), y.tolist(), threshold)
        assert got == want, (n, threshold)


def test_lttb_invariants():
    rng = np.random.default_rng(11)
    x = np.sort(rng.integers(0, 10**9, 500)).astype(np.int64)
    y = rng.normal(size=500)
    idx = lttb_select(x, y, 30)
    assert idx[0] == 0 and idx[-1] == 499  # endpoints kept
    assert len(idx) == 30
    assert (np.diff(idx) > 0).all()  # strictly increasing (a subset, in order)


def test_lttb_spark_kernel(spark):
    import pandas as pd

    rng = np.random.default_rng(3)
    rows = []
    for uid in range(5):
        xs = np.sort(rng.integers(0, 10**8, 200))
        for xv in xs:
            rows.append((uid, int(xv), float(rng.normal())))
    df = spark.createDataFrame(rows, "user_id long, x long, y double")
    out = lttb(df, "user_id", "x", "y", 25).toPandas()
    assert set(out["user_id"]) == set(range(5))
    per = out.groupby("user_id").size()
    assert (per == 25).all()
    # per-user output equals the driver-side kernel on the same series
    src = df.toPandas()
    for uid, grp in out.groupby("user_id"):
        s = src[src.user_id == uid].sort_values(["x", "y"])
        idx = lttb_select(s["x"].to_numpy(np.int64), s["y"].to_numpy(np.float64), 25)
        want = s.iloc[idx]
        got = grp.sort_values("sel_rank")
        assert got["x"].tolist() == want["x"].tolist()
        assert got["y"].tolist() == want["y"].tolist()


def test_lttb_exact_matches_float_kernel_on_integer_data():
    """On integer coordinates the exact-integer kernel must select the same
    points as the float kernel whenever no float rounding is in play (small
    magnitudes: every float area is exact) — the two differ only in edge
    truncation arithmetic, which agrees for these sizes."""
    rng = np.random.default_rng(5)
    for n, threshold in [(100, 10), (57, 20), (19, 20)]:
        x = np.sort(rng.integers(0, 10**6, n)).astype(np.int64)
        y = rng.integers(-1000, 1000, n).astype(np.int64)
        exact = lttb_select_exact([int(v) for v in x], [int(v) for v in y], threshold)
        flt = lttb_select(x, y.astype(np.float64), threshold).tolist()
        assert exact == flt, (n, threshold)


def test_lttb_exact_invariants():
    rng = np.random.default_rng(13)
    x = sorted(int(v) for v in rng.integers(0, 10**12, 500))
    y = [int(v) for v in rng.integers(-10**4, 10**4, 500)]
    idx = lttb_select_exact(x, y, 30)
    assert idx[0] == 0 and idx[-1] == 499
    assert len(idx) == 30
    assert all(b > a for a, b in zip(idx, idx[1:]))
