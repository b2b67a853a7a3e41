"""Kafka reader/mapper contract, pinned brokerless.

The sandbox has no Kafka broker, so the contract itself is the test
surface: the reader options must carry the reference sync's batching
discipline (<=100k rows per micro-batch, earliest start, consumer-group
name — kafka_clickhouse_sync.rs:51-60), and the JSON wire-byte mapping
must produce the typed record shape on captured bytes, so a real broker
environment is plug-in."""

from __future__ import annotations

import datetime as dt

from pydantic import BaseModel

from moosestack_spark.catalog.engines import Kafka
from moosestack_spark.catalog.table import (
    KAFKA_MAX_OFFSETS_PER_TRIGGER,
    OlapTable,
    kafka_reader_options,
    kafka_value_frame,
)
from moosestack_spark.datamodel import Key


class Event(BaseModel):
    id: Key[int]
    kind: str
    amount: float
    at: dt.datetime


def test_kafka_reader_options_pin_reference_discipline():
    eng = Kafka(
        broker_list="broker-1:9092,broker-2:9092",
        topic_list="events_topic",
        group_name="moose_sync_events",
        format="JSONEachRow",
    )
    opts = kafka_reader_options(eng)
    assert opts["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert opts["subscribe"] == "events_topic"
    assert opts["kafka.group.id"] == "moose_sync_events"
    # checkpoint owns progress; first start reads from the beginning
    assert opts["startingOffsets"] == "earliest"
    # the reference sync's 100k insert-batch ceiling
    assert opts["maxOffsetsPerTrigger"] == str(KAFKA_MAX_OFFSETS_PER_TRIGGER)
    assert KAFKA_MAX_OFFSETS_PER_TRIGGER == 100_000


def test_kafka_stream_reader_wires_the_options(spark, tmp_path):
    """stream_reader must route Kafka engines through kafka_reader_options
    — asserted via the DataStreamReader's captured options rather than a
    broker round-trip."""
    eng = Kafka(
        broker_list="b:9092", topic_list="t", group_name="g", format="JSONEachRow"
    )
    from moosestack_spark.catalog.table import OlapConfig

    table = OlapTable(
        "kt", Event, spark, str(tmp_path / "wh"), OlapConfig(engine=eng)
    )
    captured: dict = {}

    class SpyReader:
        def format(self, f):
            captured["format"] = f
            return self

        def options(self, **kw):
            captured.update(kw)
            return self

        def load(self):
            return None

    class SpySpark:
        readStream = SpyReader()

    table.spark = SpySpark()
    table.stream_reader()
    table.spark = spark
    assert captured["format"] == "kafka"
    assert captured["maxOffsetsPerTrigger"] == "100000"
    assert captured["subscribe"] == "t"
    assert captured["startingOffsets"] == "earliest"


def test_kafka_value_frame_maps_captured_wire_bytes(spark, tmp_path):
    """from_json mapping on captured wire rows: typed fields (incl. ISO
    timestamp revival) + source coordinates survive; an unparseable payload
    yields NULL fields (the DLQ trigger condition) without killing the
    batch."""
    table = OlapTable("kv", Event, spark, str(tmp_path / "wh"))
    wire = [
        (None, b'{"id": 1, "kind": "a", "amount": 1.5, "at": "2026-01-02T03:04:05Z"}',
         "events_topic", 0, 100),
        (None, b'{"id": 2, "kind": "b", "amount": 2.0, "at": "2026-01-02T03:04:06Z"}',
         "events_topic", 1, 7),
        (None, b"not json at all", "events_topic", 1, 8),
    ]
    raw = spark.createDataFrame(
        wire, "key binary, value binary, topic string, partition int, offset long"
    )
    rows = {
        r.offset: r
        for r in kafka_value_frame(raw, table.schema).collect()
    }
    assert rows[100].id == 1 and rows[100].kind == "a"
    assert rows[100].at == dt.datetime(2026, 1, 2, 3, 4, 5)
    assert rows[100].topic == "events_topic" and rows[100].partition == 0
    assert rows[7].amount == 2.0
    # corrupt payload -> NULL record fields, coordinates intact (DLQ route)
    assert rows[8].id is None and rows[8].topic == "events_topic"


def test_offset_commit_sequencing_after_insert(spark, tmp_path):
    """kafka_clickhouse_sync.rs:55-60 semantics, brokerless: offsets are
    committed ONLY after a successful insert, a failing insert withholds
    the commit and re-fetches the same offset, and a restarted loop
    resumes at the last committed offset (at-least-once — the duplicate
    batch is absorbed by the Replacing engine's key dedup)."""
    import json

    import pytest

    from moosestack_spark.catalog.engines import OlapConfig, ReplacingMergeTree
    from moosestack_spark.streaming.kafka_sync import (
        MAX_BATCH_ROWS,
        kafka_sync_loop,
        replay_batches,
    )

    table = OlapTable(
        "sync_dest", Event, spark, str(tmp_path / "wh"),
        OlapConfig(order_by_fields=["id"], engine=ReplacingMergeTree()),
        register=False,
    )
    records = [
        {"id": i, "kind": "k", "amount": float(i),
         "at": dt.datetime(2026, 1, 2, 3, 4, i)}
        for i in range(6)
    ]
    events: list[tuple[str, int]] = []  # interleaved (action, marker) log

    def insert(rows):
        table.insert(rows)
        events.append(("insert", rows[-1]["id"] + 1))

    def commit(off):
        events.append(("commit", off))

    final = kafka_sync_loop(replay_batches(records, 2), insert, commit)
    assert final == 6
    # strict alternation: every commit directly follows ITS batch's insert
    assert events == [
        ("insert", 2), ("commit", 2),
        ("insert", 4), ("commit", 4),
        ("insert", 6), ("commit", 6),
    ]

    # failure sequencing: batch 2's first insert attempt dies AFTER the
    # write lands (crash between insert and commit) -> no commit recorded,
    # retry re-inserts, and the duplicate is absorbed by Replacing dedup
    table.truncate()
    events.clear()
    flaky = {"armed": True}

    def flaky_insert(rows):
        table.insert(rows)
        if rows[0]["id"] == 2 and flaky["armed"]:
            flaky["armed"] = False
            raise RuntimeError("crash between insert and commit")
        events.append(("insert", rows[-1]["id"] + 1))

    final = kafka_sync_loop(replay_batches(records, 2), flaky_insert, commit)
    assert final == 6
    assert events == [
        ("insert", 2), ("commit", 2),
        ("insert", 4), ("commit", 4),  # retried batch commits once
        ("insert", 6), ("commit", 6),
    ]
    got = sorted(r.id for r in table.read().collect())
    assert got == [0, 1, 2, 3, 4, 5]  # at-least-once + key dedup = exact set

    # a batch that exhausts retries leaves the offset uncommitted so a
    # restart resumes at the failed batch
    commits: list[int] = []

    def always_fail(rows):
        raise RuntimeError("broker down")

    with pytest.raises(RuntimeError, match="broker down"):
        kafka_sync_loop(replay_batches(records, 2), always_fail, commits.append)
    assert commits == []

    # the reference's 100k poll ceiling is enforced
    with pytest.raises(ValueError, match="MAX_BATCH_ROWS"):
        kafka_sync_loop(
            replay_batches(list(range(MAX_BATCH_ROWS + 1)), MAX_BATCH_ROWS + 1),
            lambda rows: None,
            lambda off: None,
        )


def test_offset_commit_property_random_failures():
    """Property: under ANY injected insert-failure pattern, (1) a commit
    for offset o happens only after a successful insert of the batch
    ending at o, (2) committed offsets are strictly increasing, (3) every
    record is inserted at least once (at-least-once), and (4) if the loop
    completes, the final commit covers the whole stream."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from moosestack_spark.streaming.kafka_sync import kafka_sync_loop, replay_batches

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(1, 30),
        batch=st.integers(1, 7),
        fail_pattern=st.sets(st.tuples(st.integers(0, 29), st.integers(0, 1))),
    )
    def run(n, batch, fail_pattern):
        records = list(range(n))
        inserted: list[list[int]] = []
        commits: list[int] = []
        attempts: dict[tuple[int, int], int] = {}

        def insert(rows):
            inserted.append(list(rows))
            key = (rows[0], 0)
            k = attempts.get(key, 0)
            attempts[key] = k + 1
            # fail this (first_record, attempt#) if the pattern says so
            if (rows[0], k) in fail_pattern and k < 2:
                raise RuntimeError("flaky")

        def commit(off):
            # invariant 1: the LAST insert must be the batch ending at off
            assert inserted and inserted[-1][-1] == off - 1
            # invariant 2: strictly increasing
            assert not commits or off > commits[-1]
            commits.append(off)

        try:
            final = kafka_sync_loop(
                replay_batches(records, batch), insert, commit,
                max_attempts_per_batch=3,
            )
        except RuntimeError:
            # exhausted retries: nothing past the last commit was committed
            assert all(c <= (commits[-1] if commits else 0) for c in commits)
            return
        # invariant 4: loop completed -> full stream committed
        assert final == n and commits and commits[-1] == n
        # invariant 3: at-least-once
        flat = {r for rows in inserted for r in rows}
        assert flat == set(records)

    run()


# ---- consumer-group rebalance contract (brokerless) ----


def _logs(nparts=4, per=100):
    return {
        p: [f"p{p}-r{i}" for i in range(per)] for p in range(nparts)
    }


def test_rebalance_mid_flight_fences_and_resumes():
    """Member B joins while A is between insert and commit: A's commit is
    fenced (stale generation), A re-syncs, the uncommitted batch is
    re-delivered to the new owner — at-least-once with ZERO loss, and the
    duplicate is visible (that is the contract, not a bug)."""
    from moosestack_spark.streaming.kafka_sync import (
        FencedGeneration,
        GroupCoordinator,
        group_member_loop,
    )

    logs = _logs()
    coord = GroupCoordinator(logs)
    seen: list = []
    calls = {"n": 0}

    def insert_a(p, rows):
        calls["n"] += 1
        seen.extend(rows)
        if calls["n"] == 3:  # join lands BETWEEN A's insert and commit
            coord.join("B")

    group_member_loop(coord, "A", insert_a, batch_size=30)
    # A is done with ITS partitions; stale-generation commit is rejected
    with _pytest_raises(FencedGeneration):
        coord.commit("A", 1, 0, 99)
    group_member_loop(coord, "B", lambda p, rows: seen.extend(rows), batch_size=30)
    assert coord.done()
    every = [r for log in logs.values() for r in log]
    assert set(seen) == set(every), "records lost across the rebalance"
    assert len(seen) > len(every), (
        "the fenced batch must be re-delivered (at-least-once duplicate)"
    )


def test_member_leave_hands_partitions_back():
    from moosestack_spark.streaming.kafka_sync import (
        GroupCoordinator,
        group_member_loop,
    )

    logs = _logs(nparts=3, per=40)
    coord = GroupCoordinator(logs)
    seen: list = []
    # B joins, consumes ONE batch of its assignment, then crashes (leave)
    genB, partsB = coord.join("B")
    endB, rowsB = coord.poll("B", genB, partsB[0], 0, 25)
    seen.extend(rowsB)
    coord.commit("B", genB, partsB[0], endB)
    coord.leave("B")
    # A joins the now-empty group and must finish EVERYTHING, resuming
    # B's partition at B's committed offset (no re-read of committed rows)
    group_member_loop(coord, "A", lambda p, rows: seen.extend(rows), batch_size=25)
    assert coord.done()
    every = [r for log in logs.values() for r in log]
    assert sorted(seen) == sorted(every), "loss or duplicate after clean handoff"


def test_unassigned_partition_poll_and_commit_fenced():
    from moosestack_spark.streaming.kafka_sync import (
        FencedGeneration,
        GroupCoordinator,
    )

    coord = GroupCoordinator(_logs(nparts=2, per=10))
    genA, _ = coord.join("A")
    genB, partsB = coord.join("B")  # bumps generation: A's handle is stale
    with _pytest_raises(FencedGeneration):
        coord.poll("A", genA, 0, 0, 5)
    genA2, partsA2 = coord.sync("A")
    assert genA2 == genB and set(partsA2).isdisjoint(partsB)
    other = partsB[0]
    with _pytest_raises(FencedGeneration):
        coord.commit("A", genA2, other, 5)


def _pytest_raises(exc):
    import pytest

    return pytest.raises(exc)
