"""windowFunnel greedy mode semantics on hand-built event streams:
default (>=) vs strict_increase (>) vs strict_dedup (repeat kills chain).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from moosestack_spark.operators.funnel import window_funnel_greedy

def _steps():
    return [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, 0, s), et) for (u, s, et) in rows],
        "user_id long, ts timestamp, event_type string",
    )


def _levels(df):
    return {r.user_id: r.funnel_level for r in df.collect()}


def test_equal_timestamps_separate_default_from_strict_increase(spark):
    # click at the SAME second as the view: default (>=) chains, strict (>)
    # does not
    e = _events(spark, [(1, 10, "view"), (1, 10, "click"), (1, 20, "purchase")])
    assert _levels(window_funnel_greedy(e, _steps(), "INTERVAL 12 HOURS"))[1] == 3
    assert (
        _levels(
            window_funnel_greedy(
                e, _steps(), "INTERVAL 12 HOURS", mode="strict_increase"
            )
        )[1]
        == 1
    )


def test_repeat_view_kills_dedup_chain_only(spark):
    # view .. view .. click: the second view repeats a matched condition
    # before the click, so strict_dedup stops at level 1; strict_increase
    # still reaches the click and the purchase
    e = _events(
        spark,
        [(1, 0, "view"), (1, 5, "view"), (1, 10, "click"), (1, 20, "purchase")],
    )
    assert (
        _levels(
            window_funnel_greedy(
                e, _steps(), "INTERVAL 12 HOURS", mode="strict_increase"
            )
        )[1]
        == 3
    )
    # greedy scan also starts a chain at the SECOND view (5 -> 10 -> 20)
    # with no interloper, so the user still funnels fully — kill the
    # recovery by putting a third view between click and purchase
    e2 = _events(
        spark,
        [
            (1, 0, "view"),
            (1, 10, "click"),
            (1, 15, "view"),
            (1, 20, "purchase"),
        ],
    )
    assert (
        _levels(
            window_funnel_greedy(
                e2, _steps(), "INTERVAL 12 HOURS", mode="strict_dedup"
            )
        )[1]
        == 2
    )
    assert (
        _levels(
            window_funnel_greedy(
                e2, _steps(), "INTERVAL 12 HOURS", mode="strict_increase"
            )
        )[1]
        == 3
    )


def test_dedup_blocker_at_exact_next_step_time_does_not_kill(spark):
    # blocker view at exactly the purchase's timestamp: ties survive (the
    # documented strictly-between contract)
    e = _events(
        spark,
        [
            (1, 0, "view"),
            (1, 10, "click"),
            (1, 20, "view"),
            (1, 20, "purchase"),
        ],
    )
    assert (
        _levels(
            window_funnel_greedy(
                e, _steps(), "INTERVAL 12 HOURS", mode="strict_dedup"
            )
        )[1]
        == 3
    )


def test_window_bound_applies_from_start(spark):
    # purchase lands outside the 12h window anchored at the view
    e = _events(spark, [(1, 0, "view"), (1, 10, "click")])
    late = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 13, 0, 0), "purchase")],
        "user_id long, ts timestamp, event_type string",
    )
    e = e.unionByName(late)
    for mode in ("default", "strict_increase", "strict_dedup"):
        assert (
            _levels(window_funnel_greedy(e, _steps(), "INTERVAL 12 HOURS", mode))[1]
            == 2
        ), mode


def test_unknown_mode_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="unknown windowFunnel mode"):
        window_funnel_greedy(
            _events(spark, [(1, 0, "view")]), _steps(), "INTERVAL 1 HOUR", "bogus"
        )
