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


# --------------------------------------------------------------------------
# Consumer-group rebalance contract, brokerless.
#
# The live-broker transport cannot run in this environment, but the
# rebalance SEMANTICS are protocol, not transport: a group has a
# generation; joins/leaves bump it and reassign partitions; offset commits
# carry the generation and the broker REJECTS commits from a stale
# generation (ILLEGAL_GENERATION fencing), which is what makes
# at-least-once survive a rebalance — the fenced member re-syncs and the
# new owner resumes from the last committed offset.  Reference loop:
# kafka_clickhouse_sync.rs:51-60 (commit after insert); group semantics
# per the public Kafka protocol (JoinGroup/SyncGroup/OffsetCommit).
# --------------------------------------------------------------------------


class FencedGeneration(Exception):
    """Commit or poll from a stale generation / unassigned partition."""


class GroupCoordinator:
    """Brokerless consumer-group coordinator over recorded per-partition
    logs: range assignment, generation bumps on join/leave, and
    generation-fenced offset commits.  Single-threaded by design — the
    tests interleave members explicitly, which makes the races
    deterministic instead of timing-dependent."""

    def __init__(self, logs: dict[int, list[Any]]) -> None:
        self.logs = logs
        self.generation = 0
        self.members: list[str] = []
        self.assignment: dict[str, list[int]] = {}
        self.committed: dict[int, int] = {p: 0 for p in logs}

    def _rebalance(self) -> None:
        self.generation += 1
        parts = sorted(self.logs)
        self.assignment = {m: [] for m in self.members}
        for i, p in enumerate(parts):
            if self.members:
                self.assignment[self.members[i % len(self.members)]].append(p)

    def join(self, member: str) -> tuple[int, list[int]]:
        if member not in self.members:
            self.members.append(member)
        self._rebalance()
        return self.generation, self.assignment[member]

    def leave(self, member: str) -> None:
        if member in self.members:
            self.members.remove(member)
            self._rebalance()

    def sync(self, member: str) -> tuple[int, list[int]]:
        if member not in self.members:
            raise FencedGeneration(f"{member} is not in the group")
        return self.generation, self.assignment[member]

    def _check(self, member: str, generation: int, partition: int) -> None:
        if generation != self.generation:
            raise FencedGeneration(
                f"generation {generation} != current {self.generation}"
            )
        if partition not in self.assignment.get(member, []):
            raise FencedGeneration(
                f"partition {partition} not assigned to {member}"
            )

    def poll(
        self, member: str, generation: int, partition: int, offset: int, n: int
    ) -> tuple[int, list[Any]]:
        self._check(member, generation, partition)
        log = self.logs[partition]
        end = min(offset + n, len(log))
        return end, log[offset:end]

    def commit(
        self, member: str, generation: int, partition: int, offset: int
    ) -> None:
        self._check(member, generation, partition)
        if offset < self.committed[partition]:
            raise ValueError(
                f"commit {offset} behind committed {self.committed[partition]}"
            )
        self.committed[partition] = offset

    def done(self) -> bool:
        return all(
            self.committed[p] >= len(log) for p, log in self.logs.items()
        )


def group_member_loop(
    coord: GroupCoordinator,
    member: str,
    insert: Callable[[int, list[Any]], Any],
    batch_size: int = 100,
    max_steps: int = 10_000,
    step_hook: Optional[Callable[[int], None]] = None,
) -> int:
    """One member's consume loop under the group protocol: join, then per
    assigned partition consume→insert→commit from the COMMITTED offset; on
    FencedGeneration (another member joined/left mid-flight) RE-SYNC and
    resume from committed offsets — never from local state, which the
    fencing may have invalidated.  ``insert`` receives (partition, rows)
    and must be idempotent-or-dedupable downstream (at-least-once).
    ``step_hook(step)`` lets a test inject a concurrent join/leave at a
    chosen step.  Returns the number of insert calls.

    SCOPE: a single-threaded test-harness loop, not a generic daemon
    consumer — it terminates when the member's OWN assignment is drained
    (or empty, when members > partitions), and a concurrent leave() of
    THIS member makes the FencedGeneration re-sync raise out of the loop
    (the member no longer belongs to the group, so propagating is the
    honest outcome).  A long-lived consumer would instead re-join and
    loop forever; see KafkaTableSync.run for that shape."""
    generation, parts = coord.join(member)
    inserts = 0
    step = 0
    while True:
        step += 1
        if step > max_steps:
            raise RuntimeError("group loop did not converge")
        if step_hook:
            step_hook(step)
        progressed = False
        try:
            for p in list(parts):
                offset = coord.committed[p]
                end, rows = coord.poll(member, generation, p, offset, batch_size)
                if end == offset:
                    continue
                insert(p, rows)
                inserts += 1
                coord.commit(member, generation, p, end)
                progressed = True
        except FencedGeneration:
            generation, parts = coord.sync(member)
            continue
        if not progressed:
            mine_done = all(
                coord.committed[p] >= len(coord.logs[p]) for p in parts
            )
            if mine_done:
                return inserts
