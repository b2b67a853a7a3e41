"""Workflows / tasks / ETL pipelines — the thin orchestration layer
(SURVEY.md §1.1 Workflow/Task, §2.1 ETL extract/load).

Port targets:
- py-moose-lib/moose_lib/dmv2/workflow.py:56,116-189 — Task(run, retries,
  timeout_seconds, on_complete DAG), Workflow(starting_task, schedule)
- ts-moose-lib/src/dmv2/sdk/etlPipeline.ts:24-77 — batched extract
  (DEFAULT_BATCH_SIZE=20) -> transform -> load to a table or function

The reference runs these on Temporal; here they are plain Python (the
driver process IS the orchestrator), with the same retry/timeout/DAG
semantics.  Heavy lifting inside a task body is Spark work and therefore
already distributed; the orchestration itself is control-plane only.
"""

from __future__ import annotations

import datetime as dt
import time
from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass, field
from typing import Any, Optional

ETL_DEFAULT_BATCH = 20  # etlPipeline.ts:24


class TaskFailed(RuntimeError):
    pass


@dataclass
class Task:
    """workflow.py:116-189: run fn with retries/timeout, then on_complete
    successors (a DAG, executed here depth-first)."""

    name: str
    run: Callable[[Any], Any]
    retries: int = 0
    timeout_seconds: Optional[float] = None
    on_complete: list["Task"] = field(default_factory=list)

    def attempt(self, input_value: Any = None) -> Any:
        """Run THIS task's body with its retry/timeout policy — no DAG
        recursion (execute() adds that; the durable runner drives its own
        traversal so it can journal each task)."""
        attempt = 0
        while True:
            start = time.monotonic()
            try:
                result = self.run(input_value)
            except Exception as exc:
                attempt += 1
                if attempt > self.retries:
                    raise TaskFailed(f"task {self.name} failed: {exc}") from exc
                continue
            # the timeout verdict is OUTSIDE the retry loop: the body
            # SUCCEEDED (its side effects happened) — re-running a slow
            # success would duplicate work; post-hoc timeout is terminal
            if (
                self.timeout_seconds is not None
                and time.monotonic() - start > self.timeout_seconds
            ):
                raise TaskFailed(
                    f"task {self.name} exceeded timeout {self.timeout_seconds}s"
                )
            return result

    def execute(self, input_value: Any = None) -> Any:
        result = self.attempt(input_value)
        for nxt in self.on_complete:
            nxt.execute(result)
        return result


@dataclass
class Workflow:
    """workflow.py:56: a named workflow starting at one task.  `schedule`
    is a cron-ish string recorded for an external scheduler; run() is the
    manual trigger."""

    name: str
    starting_task: Task
    schedule: Optional[str] = None
    timeout_seconds: Optional[float] = None

    def run(self, input_value: Any = None) -> Any:
        start = time.monotonic()
        result = self.starting_task.execute(input_value)
        if (
            self.timeout_seconds is not None
            and time.monotonic() - start > self.timeout_seconds
        ):
            raise TaskFailed(f"workflow {self.name} exceeded timeout")
        return result


# ---------------------------------------------------------------------------
# Durable runs: Temporal-style event-sourced replay at task granularity
# (the reference persists workflow history in Temporal, workflow.py:56,
# 116-189; here the journal is an append-only JSONL file).  A crashed or
# killed run resumed with the same journal SKIPS every task already recorded
# as complete and replays its recorded result into the DAG — completed task
# side effects never re-execute.
# ---------------------------------------------------------------------------


class WorkflowJournal:
    """Append-only task-completion journal.  One JSON object per line:
    {"key": "<seq>:<task>", "ok": true, "result": ..., "opaque": bool}.
    Results must be JSON-serializable for replay (Temporal's payload rule);
    a non-serializable result is journaled opaque and its task re-runs on
    resume (weaker guarantee, explicit in the record)."""

    def __init__(self, path: str):
        import json
        import os

        self.path = path
        self._done: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    self._done[rec["key"]] = rec

    def lookup(self, key: str) -> Optional[dict]:
        rec = self._done.get(key)
        if rec is None or rec.get("opaque"):
            return None
        return rec

    def record(self, key: str, result: Any) -> None:
        import json

        try:
            payload = json.dumps({"key": key, "ok": True, "result": result})
        except TypeError:
            payload = json.dumps({"key": key, "ok": True, "opaque": True})
        with open(self.path, "a") as fh:
            fh.write(payload + "\n")
            fh.flush()
        # cache the JSON ROUND-TRIP, not the native value: an in-process
        # resume must replay byte-identically to a post-restart resume
        # (tuples->lists, datetimes/int-keyed dicts -> their json forms),
        # so successor tasks see the same input types either way
        self._done[key] = json.loads(payload)

    @property
    def completed_keys(self) -> list[str]:
        return sorted(self._done)


def run_durable(
    workflow: "Workflow", journal_path: str, input_value: Any = None
) -> Any:
    """Execute `workflow` with task-level durability: each task completion
    is journaled before its successors run, and a resumed run (same
    journal_path) replays journaled results instead of re-executing.  Task
    identity is (depth-first sequence number, task name) — stable for a
    fixed DAG, which is the same determinism contract Temporal replay
    imposes on workflow code."""
    journal = WorkflowJournal(journal_path)
    seq = 0
    start = time.monotonic()

    def exec_task(task: Task, inp: Any) -> Any:
        nonlocal seq
        key = f"{seq}:{task.name}"
        seq += 1
        rec = journal.lookup(key)
        if rec is not None:
            result = rec.get("result")
        else:
            result = task.attempt(inp)
            journal.record(key, result)
        for nxt in task.on_complete:
            exec_task(nxt, result)
        return result

    result = exec_task(workflow.starting_task, input_value)
    if (
        workflow.timeout_seconds is not None
        and time.monotonic() - start > workflow.timeout_seconds
    ):
        raise TaskFailed(f"workflow {workflow.name} exceeded timeout")
    return result


# ETLPipeline lives in moosestack_spark.pipeline (the canonical port of
# etlPipeline.ts batched extract->transform->load); re-exported here because
# the reference declares ETL pipelines alongside workflows.
from moosestack_spark.pipeline import ETLPipeline  # noqa: E402,F401


def cron_next_after(schedule: str, after: "dt.datetime") -> "dt.datetime":
    """Next fire time of a 5-field cron (minute hour dom month dow) strictly
    after `after`.  Supports *, lists, ranges, and */step — the subset the
    reference's Temporal schedules use (workflow.py:56 `schedule`).
    Pure computation: the driver (or an external scheduler) decides when to
    call Workflow.run(); nothing here sleeps or spawns threads."""

    def parse(field: str, lo: int, hi: int) -> set[int]:
        out: set[int] = set()
        for part in field.split(","):
            step = 1
            if "/" in part:
                part, step_s = part.split("/", 1)
                step = int(step_s)
            if part in ("*", ""):
                rng = range(lo, hi + 1)
            elif "-" in part:
                a, b = part.split("-", 1)
                rng = range(int(a), int(b) + 1)
            else:
                rng = range(int(part), int(part) + 1)
            # steps count from the range's own start (vixie: "10-20/5" is
            # 10,15,20), not from the field minimum
            out.update(v for v in rng if (v - rng.start) % step == 0)
        if not out:
            raise ValueError(f"empty cron field {field!r}")
        return out

    def unrestricted(field: str) -> bool:
        # "*" and "*/step" leave the field unrestricted for the dom/dow rule
        return field.split("/", 1)[0] in ("*", "")

    fields = schedule.split()
    if len(fields) != 5:
        raise ValueError(f"need 5 cron fields, got {schedule!r}")
    minutes = parse(fields[0], 0, 59)
    hours = parse(fields[1], 0, 23)
    doms = parse(fields[2], 1, 31)
    months = parse(fields[3], 1, 12)
    dows = parse(fields[4], 0, 6)  # 0=Sunday (cron convention)
    # vixie-cron day rule (also what Temporal implements): when BOTH dom and
    # dow are restricted the day matches if EITHER matches ("0 0 1 * 1" =
    # the 1st of the month PLUS every Monday); when at most one is
    # restricted, both sets apply conjunctively (the unrestricted one is
    # all-days so the AND is vacuous for it).
    day_is_or = not unrestricted(fields[2]) and not unrestricted(fields[4])

    t = (after + dt.timedelta(minutes=1)).replace(second=0, microsecond=0)
    for _ in range(366 * 24 * 60):
        cron_dow = (t.weekday() + 1) % 7  # python Mon=0 -> cron Sun=0
        dom_ok = t.day in doms
        dow_ok = cron_dow in dows
        day_ok = (dom_ok or dow_ok) if day_is_or else (dom_ok and dow_ok)
        if (
            t.minute in minutes
            and t.hour in hours
            and day_ok
            and t.month in months
        ):
            return t
        t += dt.timedelta(minutes=1)
    raise ValueError(f"cron {schedule!r} never fires within a year")


# ---------------------------------------------------------------------------
# Multi-worker durable runs: the reference delegates this to Temporal task
# queues (py dmv2/workflow.py:116-189 — many workers poll, the server
# leases activities and re-dispatches on worker death).  Brokerless
# equivalent on the same JSONL journal: task identity stays (DFS seq :
# name) — a run_durable journal resumes under a pool and vice versa — and
# mutual exclusion is a per-task LEASE file (atomic tmp+replace, expiry
# clock injectable for deterministic tests).  Completed tasks never
# re-execute (journal); an in-flight task whose worker dies is re-leased
# after expiry and re-runs — at-least-once, exactly Temporal's activity
# contract.
# ---------------------------------------------------------------------------


def _task_table(workflow: "Workflow") -> list[tuple[str, "Task", Optional[str]]]:
    """DFS pre-order (the run_durable numbering): [(key, task, parent_key)]."""
    table: list[tuple[str, Task, Optional[str]]] = []
    seq = 0

    def walk(task: Task, parent_key: Optional[str]) -> None:
        nonlocal seq
        key = f"{seq}:{task.name}"
        seq += 1
        table.append((key, task, parent_key))
        for nxt in task.on_complete:
            walk(nxt, key)

    walk(workflow.starting_task, None)
    return table


class LeaseStore:
    """Per-task lease files next to the journal.  Acquisition is
    last-writer-wins via atomic replace, then a read-back confirms
    ownership — good enough for single-host workers (the reference's
    multi-host story is Temporal's server, which this deliberately does
    not re-implement)."""

    def __init__(self, journal_path: str, now: Callable[[], float] = time.time):
        import os

        self.dir = journal_path + ".leases"
        os.makedirs(self.dir, exist_ok=True)
        self.now = now

    def _path(self, key: str) -> str:
        import hashlib
        import os

        return os.path.join(
            self.dir, hashlib.md5(key.encode()).hexdigest() + ".lease"
        )

    def _flocked(self, path: str):
        """Exclusive kernel lock (flock) on a per-key sidecar file held
        across the read -> unlink -> link critical sections below — this
        closes the residual heartbeat/takeover TOCTOU ADVICE r11 flagged
        (holder's lease expires between read and unlink; a peer links in
        that instant; the unlink then deletes the PEER's live lease).
        With every mutation serialized under the flock, the read and the
        unlink are atomic with respect to cooperating workers on the same
        filesystem.  The link-based protocol inside remains correct on
        its own terms and is the fallback where fcntl is unavailable
        (non-POSIX); flock sidecars are never deleted, so there is no
        unlink race on the lock file itself."""
        import contextlib

        @contextlib.contextmanager
        def _cm():
            try:
                import fcntl
            except ImportError:  # non-POSIX: fall back to link protocol
                yield
                return
            with open(path + ".lock", "a+") as fh:
                fcntl.flock(fh.fileno(), fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(fh.fileno(), fcntl.LOCK_UN)

        return _cm()

    def try_acquire(self, key: str, worker: str, lease_seconds: float) -> bool:
        """Atomic acquisition via os.link of a fully-written temp file —
        link fails with EEXIST if any lease is present, so there is no
        window where two writers both read back their own write (the
        replace+read-back spelling had exactly that race) and no window
        where a reader sees a half-written lease."""
        import json
        import os

        path = self._path(key)
        tmp = path + f".{worker}.tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"worker": worker, "expires": self.now() + lease_seconds}, fh
            )
        try:
            with self._flocked(path):
                return self._acquire_locked(path, tmp, worker)
        finally:
            if tmp is not None:
                try:
                    os.unlink(tmp)
                except OSError:
                    pass

    def _acquire_locked(self, path: str, tmp: str, worker: str) -> bool:
        """try_acquire's body, run under the per-key flock (or bare on
        platforms without fcntl — the link protocol is standalone-safe,
        just with the documented expiry-instant TOCTOU)."""
        import json
        import os

        for _ in range(3):  # takeover needs one unlink + re-link round
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                pass
            try:
                with open(path) as fh:
                    cur = json.load(fh)
            except FileNotFoundError:
                continue  # holder released between link and read: retry
            except ValueError:
                return False  # unreadable: treat as held, retry later
            if cur["worker"] == worker and cur["expires"] > self.now():
                # already mine and live: HEARTBEAT — renew via the
                # same race-free primitive as acquisition (unlink own
                # lease, then exclusive link of the fresh temp).  The
                # earlier os.replace spelling could clobber a peer
                # that legitimately took over an expired lease in the
                # read->replace window; with link, a peer that wins
                # the gap surfaces as FileExistsError and we report
                # ownership LOST instead of silently usurping it.
                # (The old residual window — lease expires in the
                # read->unlink instant while a peer links — is closed by
                # the per-key flock this method runs under (ADVICE r11):
                # a peer cannot interleave its link between our read and
                # unlink.  Only on platforms without fcntl does the bare
                # link protocol run, where lease_seconds exceeding
                # worst-case renewal latency is the remaining guard.)
                try:
                    os.unlink(path)
                except FileNotFoundError:
                    pass
                try:
                    os.link(tmp, path)
                    return True
                except FileExistsError:
                    return False  # peer acquired in the gap: lost
            if cur["expires"] > self.now():
                return False  # live lease held by someone else
            # expired: remove and retry the exclusive link — two
            # racing takers both unlink (one wins, one ENOENT), then
            # exactly one link succeeds
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass
        return False

    def release(self, key: str) -> None:
        import os

        try:
            os.unlink(self._path(key))
        except OSError:
            pass


class DurableWorker:
    """One worker of a durable pool: step() claims and executes ONE ready
    task (parent journaled, not yet completed, lease acquirable) and
    returns its key, or None when nothing is claimable right now.  Crash
    simulation for tests: die_after_claim makes step() lease a task and
    stop — the lease must expire before another worker can take over."""

    def __init__(
        self,
        workflow: "Workflow",
        journal_path: str,
        worker_id: str,
        lease_seconds: float = 30.0,
        now: Callable[[], float] = time.time,
        die_after_claim: bool = False,
    ):
        self.table = _task_table(workflow)
        self.journal_path = journal_path
        self.worker_id = worker_id
        self.lease_seconds = lease_seconds
        self.leases = LeaseStore(journal_path, now=now)
        self.die_after_claim = die_after_claim

    def step(self) -> Optional[str]:
        journal = WorkflowJournal(self.journal_path)  # re-read: see peers
        done = {k for k in journal.completed_keys if journal.lookup(k)}
        for key, task, parent in self.table:
            if key in done:
                continue
            if parent is not None and parent not in done:
                continue  # not ready
            if not self.leases.try_acquire(
                key, self.worker_id, self.lease_seconds
            ):
                continue  # someone else is (or was recently) on it
            if self.die_after_claim:
                return key  # simulated crash: lease held, work never done
            # post-lease journal re-check: a peer may have completed this
            # task between our journal read and our acquisition (it
            # records BEFORE releasing, so holding the lease means any
            # completed peer's record is already visible)
            journal = WorkflowJournal(self.journal_path)
            if journal.lookup(key) is not None:
                self.leases.release(key)
                continue
            rec = journal.lookup(parent) if parent else None
            inp = rec.get("result") if rec else None
            result = task.attempt(inp)
            journal.record(key, result)
            self.leases.release(key)
            return key
        return None

    def run_until_idle(self, max_steps: int = 10_000) -> int:
        n = 0
        while self.step() is not None:
            n += 1
            if n > max_steps:
                raise RuntimeError("worker did not converge")
        return n


def run_durable_pool(
    workflow: "Workflow",
    journal_path: str,
    input_value: Any = None,
    n_workers: int = 2,
    lease_seconds: float = 30.0,
) -> Any:
    """Drive the whole DAG to completion with n_workers concurrent threads
    sharing the journal + lease files, then return the starting task's
    journaled result (run_durable's contract).  input_value is only
    honored for a FRESH root (matching run_durable: a resumed root task
    replays its journaled result)."""
    import threading

    table = _task_table(workflow)
    root_key = table[0][0]
    journal = WorkflowJournal(journal_path)
    if journal.lookup(root_key) is None and input_value is not None:
        # seed the root input by running the root inline (leased, so a
        # concurrent pool on the same journal cannot double-run it)
        w0 = DurableWorker(workflow, journal_path, "pool-seed", lease_seconds)
        if w0.leases.try_acquire(root_key, "pool-seed", lease_seconds):
            result = workflow.starting_task.attempt(input_value)
            WorkflowJournal(journal_path).record(root_key, result)
            w0.leases.release(root_key)

    workers = [
        DurableWorker(workflow, journal_path, f"w{i}", lease_seconds)
        for i in range(n_workers)
    ]
    threads = [
        threading.Thread(target=w.run_until_idle, daemon=True) for w in workers
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=workflow.timeout_seconds or 300.0)
    final = WorkflowJournal(journal_path)
    missing = [
        k for k, _, p in _task_table(workflow) if final.lookup(k) is None
    ]
    if missing:
        raise TaskFailed(
            f"pool finished with incomplete tasks (crashed workers whose "
            f"leases have not expired?): {missing}"
        )
    return final.lookup(root_key).get("result")
