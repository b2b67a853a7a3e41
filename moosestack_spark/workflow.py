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

    def execute(self, input_value: Any = None) -> Any:
        attempt = 0
        while True:
            start = time.monotonic()
            try:
                result = self.run(input_value)
                if (
                    self.timeout_seconds is not None
                    and time.monotonic() - start > self.timeout_seconds
                ):
                    raise TaskFailed(
                        f"task {self.name} exceeded timeout {self.timeout_seconds}s"
                    )
                break
            except Exception as exc:
                attempt += 1
                if attempt > self.retries:
                    raise TaskFailed(f"task {self.name} failed: {exc}") from exc
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


@dataclass
class ETLPipeline:
    """etlPipeline.ts:55-77: extract (iterable) -> transform (1->0..n) ->
    load, consumed in batches of `batch_size`."""

    extract: Callable[[], Iterable[Any]]
    transform: Callable[[Any], Any]  # returns item | list | None
    load: Callable[[list[Any]], None]
    batch_size: int = ETL_DEFAULT_BATCH

    def run(self) -> int:
        loaded = 0
        batch: list[Any] = []

        def flush() -> None:
            nonlocal loaded, batch
            if batch:
                self.load(batch)
                loaded += len(batch)
                batch = []

        for item in self.extract():
            out = self.transform(item)
            if out is None:
                continue
            items = out if isinstance(out, (list, tuple)) else [out]
            for o in items:
                batch.append(o)
                if len(batch) >= self.batch_size:
                    flush()
        flush()
        return loaded
