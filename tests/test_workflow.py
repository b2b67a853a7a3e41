"""Workflow/Task/ETL tests (reference: dmv2/workflow.py retry/DAG semantics,
etlPipeline.ts batching)."""

from __future__ import annotations

import pytest

from moosestack_spark.workflow import ETLPipeline, Task, TaskFailed, Workflow


def test_task_retries_then_succeeds():
    calls = {"n": 0}

    def flaky(_):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert Task("t", flaky, retries=3).execute() == "ok"
    assert calls["n"] == 3


def test_task_exhausts_retries():
    def always_fails(_):
        raise RuntimeError("boom")

    with pytest.raises(TaskFailed, match="boom"):
        Task("t", always_fails, retries=2).execute()


def test_on_complete_dag_passes_results():
    seen = []
    leaf = Task("leaf", lambda v: seen.append(v))
    mid = Task("mid", lambda v: v * 2, on_complete=[leaf])
    root = Task("root", lambda v: v + 1, on_complete=[mid])
    Workflow("w", root).run(10)
    assert seen == [22]


def test_etl_batching_and_zero_or_many():
    loads: list[list[int]] = []
    pipeline = ETLPipeline(
        extract=lambda: range(10),
        transform=lambda x: None if x % 3 == 0 else ([x, x] if x % 3 == 1 else x),
        load=loads.append,
        batch_size=4,
    )
    stats = pipeline.run()
    flat = [x for b in loads for x in b]
    # 0,3,6,9 dropped; 1,4,7 doubled; 2,5,8 kept
    assert sorted(flat) == sorted([1, 1, 4, 4, 7, 7, 2, 5, 8])
    assert stats["extracted"] == 10 and stats["loaded"] == len(flat)
    # one load per extract batch (batches of 4 extracted items; fan-out can
    # make an output batch larger — reference semantics etlPipeline.ts:24)
    assert len(loads) == 3


def test_cron_next_after():
    import datetime as dt

    from moosestack_spark.workflow import cron_next_after

    base = dt.datetime(2024, 3, 1, 10, 30)
    # every 15 minutes
    assert cron_next_after("*/15 * * * *", base) == dt.datetime(2024, 3, 1, 10, 45)
    # daily at 02:00
    assert cron_next_after("0 2 * * *", base) == dt.datetime(2024, 3, 2, 2, 0)
    # Mondays at 09:00 (2024-03-01 is a Friday -> next Monday is 03-04)
    assert cron_next_after("0 9 * * 1", base) == dt.datetime(2024, 3, 4, 9, 0)
    # first of month
    assert cron_next_after("0 0 1 * *", base) == dt.datetime(2024, 4, 1, 0, 0)
    import pytest as _p

    with _p.raises(ValueError):
        cron_next_after("* * * *", base)


def test_cron_vixie_dom_dow_or_rule():
    import datetime as dt

    from moosestack_spark.workflow import cron_next_after

    # both dom and dow restricted -> fires when EITHER matches (vixie rule):
    # "0 0 1 * 1" = 1st of month PLUS every Monday.  2024-03-01 is a Friday;
    # the next Monday (03-04) comes before the next 1st (04-01).
    base = dt.datetime(2024, 3, 1, 10, 30)
    assert cron_next_after("0 0 1 * 1", base) == dt.datetime(2024, 3, 4, 0, 0)
    # only dow restricted -> plain AND semantics unchanged
    assert cron_next_after("0 0 * * 1", base) == dt.datetime(2024, 3, 4, 0, 0)
    # only dom restricted -> plain AND semantics unchanged
    assert cron_next_after("0 0 2 * *", base) == dt.datetime(2024, 3, 2, 0, 0)


def test_cron_range_step_counts_from_range_start():
    import datetime as dt

    from moosestack_spark.workflow import cron_next_after

    # dom "10-20/5" = {10, 15, 20} (steps from the range start, not the
    # field minimum which would give {11, 16})
    base = dt.datetime(2024, 3, 1, 0, 0)
    t1 = cron_next_after("0 0 10-20/5 * *", base)
    assert t1 == dt.datetime(2024, 3, 10, 0, 0)
    t2 = cron_next_after("0 0 10-20/5 * *", t1)
    assert t2 == dt.datetime(2024, 3, 15, 0, 0)
    t3 = cron_next_after("0 0 10-20/5 * *", t2)
    assert t3 == dt.datetime(2024, 3, 20, 0, 0)


# --------------------------------------------------------------------------
# Durable runs (journal-backed resume — the Temporal-persistence stand-in)
# --------------------------------------------------------------------------


def test_durable_run_resumes_without_reexecuting_completed_tasks(tmp_path):
    from moosestack_spark.workflow import Task, TaskFailed, Workflow, run_durable

    journal = str(tmp_path / "wf.jsonl")
    calls = {"extract": 0, "load": 0}
    fail_first = {"load": True}

    def extract(_):
        calls["extract"] += 1
        return [1, 2, 3]

    def load(rows):
        calls["load"] += 1
        if fail_first["load"]:
            fail_first["load"] = False
            raise RuntimeError("transient sink outage")
        return sum(rows)

    def build():
        t_load = Task(name="load", run=load)
        return Workflow(
            "etl", Task(name="extract", run=extract, on_complete=[t_load])
        )

    # first run crashes in `load` (no retries)
    try:
        run_durable(build(), journal)
        raise AssertionError("expected failure")
    except TaskFailed:
        pass
    assert calls == {"extract": 1, "load": 1}

    # resume: extract is journaled -> replayed, only load re-runs
    # (run() returns the STARTING task's result, same as Workflow.run)
    result = run_durable(build(), journal)
    assert result == [1, 2, 3]
    assert calls == {"extract": 1, "load": 2}

    # a third run replays everything — zero new executions
    assert run_durable(build(), journal) == [1, 2, 3]
    assert calls == {"extract": 1, "load": 2}


def test_durable_journal_replays_results_into_successors(tmp_path):
    from moosestack_spark.workflow import Task, Workflow, run_durable

    journal = str(tmp_path / "wf2.jsonl")
    seen = []

    def a(_):
        return {"n": 41}

    def b(prev):
        seen.append(prev)
        return prev["n"] + 1

    wf = Workflow("two", Task(name="a", run=a, on_complete=[Task(name="b", run=b)]))
    assert run_durable(wf, journal) == {"n": 41}
    # crash-free resume still replays the recorded dict into b
    assert run_durable(wf, journal) == {"n": 41}
    assert seen == [{"n": 41}]  # b executed once; replay came from journal


def test_durable_opaque_results_rerun(tmp_path):
    """A non-JSON-serializable result is journaled opaque: its task (and
    its successors' inputs) re-run on resume — the documented weaker
    guarantee."""
    from moosestack_spark.workflow import Task, Workflow, run_durable

    journal = str(tmp_path / "wf3.jsonl")
    calls = {"a": 0}

    def a(_):
        calls["a"] += 1
        return object()  # not JSON-serializable

    wf = Workflow("opaque", Task(name="a", run=a))
    run_durable(wf, journal)
    run_durable(wf, journal)
    assert calls["a"] == 2


# ---- multi-worker durable pool ----


def _chain_workflow(log):
    from moosestack_spark.workflow import Task, Workflow

    t3 = Task(name="load", run=lambda x: (log.append(("load", x)), x + 100)[1])
    t2 = Task(
        name="transform",
        run=lambda x: (log.append(("transform", x)), x * 2)[1],
        on_complete=[t3],
    )
    t1 = Task(
        name="extract",
        run=lambda x: (log.append(("extract", x)), (x or 0) + 1)[1],
        on_complete=[t2],
    )
    return Workflow(name="wf", starting_task=t1)


def test_pool_runs_dag_once_across_workers(tmp_path):
    from moosestack_spark.workflow import run_durable_pool

    log = []
    out = run_durable_pool(
        _chain_workflow(log), str(tmp_path / "j.jsonl"), input_value=5, n_workers=3
    )
    assert out == 6  # starting task's result, same contract as run_durable
    assert sorted(n for n, _ in log) == ["extract", "load", "transform"]


def test_pool_journal_interchangeable_with_run_durable(tmp_path):
    """Same task keys: a run_durable journal resumes under the pool with
    zero re-execution, and the pool's journal replays under run_durable."""
    from moosestack_spark.workflow import run_durable, run_durable_pool

    jp = str(tmp_path / "j.jsonl")
    log1: list = []
    run_durable(_chain_workflow(log1), jp, input_value=5)
    log2: list = []
    out = run_durable_pool(_chain_workflow(log2), jp, n_workers=2)
    assert out == 6
    assert log2 == []  # everything replayed from the journal
    log3: list = []
    assert run_durable(_chain_workflow(log3), jp, input_value=5) == 6
    assert log3 == []


def test_worker_crash_lease_expiry_takeover(tmp_path):
    """Worker A leases 'transform' and dies; B cannot claim it until the
    lease expires, then takes over and finishes — completed tasks are
    never re-run, the crashed in-flight task re-runs (at-least-once)."""
    from moosestack_spark.workflow import DurableWorker, run_durable

    jp = str(tmp_path / "j.jsonl")
    clock = {"t": 1000.0}
    now = lambda: clock["t"]  # noqa: E731

    log: list = []
    wf = _chain_workflow(log)
    # complete the root first so 'transform' is the next ready task
    a = DurableWorker(wf, jp, "A", lease_seconds=30, now=now)
    assert a.step() == "0:extract"
    a_crash = DurableWorker(
        wf, jp, "A", lease_seconds=30, now=now, die_after_claim=True
    )
    assert a_crash.step() == "1:transform"  # leased, never executed
    b = DurableWorker(wf, jp, "B", lease_seconds=30, now=now)
    assert b.step() is None, "live lease must block takeover"
    clock["t"] += 31.0  # lease expires
    assert b.step() == "1:transform"
    assert b.step() == "2:load"
    assert b.step() is None
    # extract ran once, transform ran once (by B), load once
    assert sorted(n for n, _ in log) == ["extract", "load", "transform"]
    log4: list = []
    assert run_durable(_chain_workflow(log4), jp, input_value=5) == 1
    assert log4 == []  # fully journaled


def test_lease_heartbeat_on_reacquire(tmp_path):
    """A live holder re-acquiring its own lease REFRESHES the expiry
    (heartbeat): a task running longer than lease_seconds keeps its lease
    as long as it re-acquires, and a peer can never take over while the
    holder heartbeats — only after the last heartbeat expires."""
    from moosestack_spark.workflow import LeaseStore

    clock = {"t": 1000.0}
    store = LeaseStore(str(tmp_path / "j.jsonl"), now=lambda: clock["t"])
    assert store.try_acquire("k", "A", lease_seconds=30)
    clock["t"] = 1025.0  # 5s before expiry: heartbeat
    assert store.try_acquire("k", "A", lease_seconds=30)
    clock["t"] = 1045.0  # past the ORIGINAL expiry, inside the refreshed
    assert not store.try_acquire("k", "B", lease_seconds=30)
    assert store.try_acquire("k", "A", lease_seconds=30)  # heartbeat again
    clock["t"] = 1080.0  # past the last heartbeat's expiry
    assert store.try_acquire("k", "B", lease_seconds=30)


def test_lease_heartbeat_detects_peer_takeover(tmp_path):
    """ADVICE r10: the renewal path must use the same race-free primitive
    as acquisition.  If a peer links its lease into the unlink->link gap
    of a stalled holder's heartbeat, the holder must observe LOST
    ownership (FileExistsError) instead of clobbering the peer's live
    lease and leaving two workers both believing they hold it."""
    import json
    import os

    from moosestack_spark.workflow import LeaseStore

    clock = {"t": 1000.0}
    store = LeaseStore(str(tmp_path / "j.jsonl"), now=lambda: clock["t"])
    assert store.try_acquire("k", "A", lease_seconds=30)

    # simulate the peer winning the gap: monkeypatch os.unlink so that
    # immediately after A's heartbeat unlinks its lease, B's lease lands
    path = store._path("k")
    real_unlink = os.unlink
    state = {"raced": False}

    def racing_unlink(p, *a, **kw):
        real_unlink(p, *a, **kw)
        if p == path and not state["raced"]:
            state["raced"] = True
            with open(path, "w") as fh:
                json.dump({"worker": "B", "expires": clock["t"] + 30}, fh)

    clock["t"] = 1020.0
    os.unlink = racing_unlink
    try:
        got = store.try_acquire("k", "A", lease_seconds=30)
    finally:
        os.unlink = real_unlink
    assert got is False  # A observed the lost race, did not clobber B
    with open(path) as fh:
        assert json.load(fh)["worker"] == "B"  # B's lease survived intact
