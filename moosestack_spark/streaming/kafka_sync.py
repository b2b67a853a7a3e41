"""Kafka→table sync loop: the offset-commit sequencing contract.

Reference: apps/framework-cli kafka_clickhouse_sync.rs:51-60 — the sync
consumes up to 100k rows per poll, inserts the batch into the OLAP table,
and commits the consumer-group offsets ONLY AFTER the insert returns —
at-least-once delivery: a crash between insert and commit re-delivers the
batch (the Replacing engine's key dedup absorbs the duplicate), a crash
before the insert loses nothing.

In production Spark this discipline is inherited from Structured Streaming
(foreachBatch + checkpoint commit after the batch function returns — see
streaming/runner.py); this module states the loop explicitly so the
sequencing contract is testable brokerless against recorded bytes, and so
a non-Spark consumer (e.g. a plain kafka-python poller feeding
OlapTable.insert) gets the same guarantee.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional

#: the reference sync's per-poll ceiling (kafka_clickhouse_sync.rs:51)
MAX_BATCH_ROWS = 100_000


def kafka_sync_loop(
    fetch: Callable[[int], Optional[tuple[int, list[Any]]]],
    insert: Callable[[list[Any]], Any],
    commit: Callable[[int], None],
    start_offset: int = 0,
    max_attempts_per_batch: int = 3,
) -> int:
    """Drive the consume→insert→commit loop until ``fetch`` returns None.

    - ``fetch(offset)`` returns ``(next_offset, rows)`` for the batch
      beginning at ``offset`` (rows ≤ MAX_BATCH_ROWS), or None at
      end-of-stream.
    - ``insert(rows)`` writes the batch to the destination table; raising
      aborts the attempt WITHOUT committing, and the batch is RE-FETCHED
      from the same offset (at-least-once; a transactional fetch source
      sees a genuine re-read, not a replay of stale rows).
    - ``commit(next_offset)`` persists consumer-group progress; it is
      called ONLY after ``insert`` returns — never before, never on
      failure.

    An empty poll that does not advance the offset (``(offset, [])`` — a
    live consumer with no new records) returns control to the caller
    instead of busy-spinning; re-invoke after a poll delay.

    Returns the final committed offset.  A batch failing
    ``max_attempts_per_batch`` times re-raises the insert error with the
    offset uncommitted, so a restarted loop resumes at the failed batch.
    """
    offset = start_offset
    attempts = 0
    while True:
        batch = fetch(offset)
        if batch is None:
            return offset
        next_offset, rows = batch
        if next_offset == offset:
            # empty poll, no progress: hand control back (no busy-spin)
            return offset
        if len(rows) > MAX_BATCH_ROWS:
            raise ValueError(
                f"batch of {len(rows)} rows exceeds MAX_BATCH_ROWS "
                f"({MAX_BATCH_ROWS}); size the poll to the reference ceiling"
            )
        try:
            insert(rows)
        except Exception:
            attempts += 1
            if attempts >= max_attempts_per_batch:
                raise
            continue  # RE-FETCH the same offset, commit withheld
        attempts = 0
        commit(next_offset)
        offset = next_offset


def replay_batches(
    records: list[Any], batch_size: int
) -> Callable[[int], Optional[tuple[int, list[Any]]]]:
    """A recorded-bytes fetch: serve ``records`` in order, ``batch_size``
    at a time, keyed by offset — the brokerless stand-in for a consumer
    poll (offsets = record indexes, as in a single-partition topic)."""

    def fetch(offset: int) -> Optional[tuple[int, list[Any]]]:
        if offset >= len(records):
            return None
        end = min(offset + batch_size, len(records))
        return end, records[offset:end]

    return fetch
