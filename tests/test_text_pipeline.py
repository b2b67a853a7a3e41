"""Unit tests for the C4 filter / PII redaction / decontamination ops."""

from __future__ import annotations

import pyspark.sql.functions as F

from moosestack_spark.ops.decontaminate import contaminated_docs, word_ngrams
from moosestack_spark.ops.text import redact_pii


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [("a b", 1), ("a b c d", 2), ("", 3)], "text string, id int"
    ).select("id", word_ngrams(F.col("text"), 3).alias("g"))
    got = {r.id: r.g for r in df.collect()}
    assert got[1] == []  # 2 words < n=3: guarded (sequence(1,0) counts DOWN)
    assert got[2] == ["a b c", "b c d"]
    assert got[3] == []


def test_redact_pii_order_and_patterns(spark):
    text = "mail bob.s@mail10.1.2.3.com ip 192.168.0.1 call 555-0134 x"
    row = spark.range(1).select(
        redact_pii(F.lit(text)).alias("r")
    ).first()
    # email with an IP-like domain is eaten whole by the EMAIL pass first
    assert row.r == "mail <EMAIL> ip <IP> call <PHONE> x"


def test_contaminated_docs_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),      # shares "alpha beta gamma"
            (2, "zeta eta theta iota"),         # no overlap
            (3, "x alpha beta gamma y"),        # shares the same 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "alpha beta gamma epsilon")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.n_contaminated
        for r in contaminated_docs(docs, bench, n=3).collect()
    }
    assert got == {1: 1, 3: 1}


def test_split_assign_stable_under_repartition(spark):
    from moosestack_spark.ops.text import split_assign

    df = spark.range(0, 2000).select(F.col("id"))
    a = {r.id: r.s for r in df.select("id", split_assign(F.col("id")).alias("s")).collect()}
    b = {
        r.id: r.s
        for r in df.repartition(13, "id")
        .select("id", split_assign(F.col("id")).alias("s"))
        .collect()
    }
    assert a == b  # assignment is a pure function of the id, not of layout
    frac_val = sum(1 for v in a.values() if v == "val") / len(a)
    frac_test = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.02 < frac_val < 0.09 and 0.02 < frac_test < 0.09


def test_window_funnel_semantics(spark):
    """Chain must be strictly increasing and inside the window OF THE
    CHAIN'S FIRST event; a later restart can still complete the funnel."""
    from datetime import datetime

    from moosestack_spark.operators.funnel import window_funnel

    rows = [
        # u1: view -> click -> purchase inside 1h of the view => 3
        (1, "view", datetime(2024, 1, 1, 10, 0)),
        (1, "click", datetime(2024, 1, 1, 10, 20)),
        (1, "purchase", datetime(2024, 1, 1, 10, 40)),
        # u2: purchase OUTSIDE 1h of first view, but a SECOND view restarts
        # the chain and completes in time => 3
        (2, "view", datetime(2024, 1, 1, 9, 0)),
        (2, "click", datetime(2024, 1, 1, 9, 30)),
        (2, "view", datetime(2024, 1, 1, 11, 0)),
        (2, "click", datetime(2024, 1, 1, 11, 10)),
        (2, "purchase", datetime(2024, 1, 1, 11, 20)),
        # u3: click BEFORE view never counts; no chain past level 1
        (3, "click", datetime(2024, 1, 1, 8, 0)),
        (3, "view", datetime(2024, 1, 1, 8, 30)),
        (3, "purchase", datetime(2024, 1, 1, 8, 40)),
        # u4: purchase at exactly view+window is INSIDE (<=) => 3
        (4, "view", datetime(2024, 1, 1, 12, 0)),
        (4, "click", datetime(2024, 1, 1, 12, 30)),
        (4, "purchase", datetime(2024, 1, 1, 13, 0)),
        # u5: no view at all -> absent from output
        (5, "click", datetime(2024, 1, 1, 12, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(
            df,
            [
                F.col("event_type") == "view",
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
            ],
            "INTERVAL 1 HOUR",
        ).collect()
    }
    assert got == {1: 3, 2: 3, 3: 1, 4: 3}


def test_window_funnel_bot_skew_bounded(spark):
    """A bot user with 1k views and 1k clicks inside one window must not
    blow the level-2 intermediate up to the 10^6 (view, click) witness
    product — _advance_level keeps min(prev) per (user, start), so the
    intermediate stays at <= one row per view, and the funnel level is
    still exact."""
    from datetime import datetime, timedelta

    from moosestack_spark.operators.funnel import _advance_level, window_funnel

    t0 = datetime(2024, 1, 1, 0, 0)
    rows = [(1, "view", t0 + timedelta(seconds=2 * i)) for i in range(1000)]
    rows += [(1, "click", t0 + timedelta(seconds=2 * i + 1)) for i in range(1000)]
    rows.append((1, "purchase", t0 + timedelta(seconds=2001)))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    views = df.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("ts").alias("t")
    )
    clicks = df.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("t2")
    )
    chain = views.select(
        "u", F.col("t").alias("start"), F.col("t").alias("prev")
    ).distinct()
    lvl2 = _advance_level(chain, clicks, F.expr("INTERVAL 12 HOURS"))
    assert lvl2.count() == 1000  # one row per view start, not 1000*1000

    got = {
        r.user_id: r.funnel_level
        for r in window_funnel(
            df,
            [
                F.col("event_type") == "view",
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
            ],
            "INTERVAL 12 HOURS",
        ).collect()
    }
    assert got == {1: 3}
