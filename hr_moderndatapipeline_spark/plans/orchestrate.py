"""Lightweight DAG orchestration (SURVEY.md §3.4 / VERDICT r3
"What's missing" #2).

The reference schedules its pipeline with Airflow: a DAG of
PythonOperator tasks, manual trigger, catchup off
(airflow/dags/produce_event_dag.py:7-20) plus dbt's
dependency-ordered model runs. The engine already has the
dependency-ordered materialization half (plans/models.py); this
module adds the orchestration half Airflow provides around it —
without an external scheduler process:

- ``TaskSpec`` — a named task with explicit upstream deps, a retry
  budget, and a backoff delay (Airflow's ``retries`` /
  ``retry_delay``).
- ``Dag.run(logical_date)`` — topological execution with per-task
  retry; a failed task marks every transitive downstream
  ``upstream_failed`` and the run continues on independent branches
  (Airflow's trigger-rule default).
- **Resume**: successful (dag, logical_date, task) completions are
  journaled to a JSON state file; a re-run of the same logical date
  skips them — the idempotent-retry semantics a checkpoint gives a
  stream.
- ``Dag.backfill(dates)`` — ordered catch-up over a list of logical
  dates (Airflow's ``catchup=True``), skipping dates already fully
  green in the journal.

Everything is driver-side control flow over O(#tasks) metadata; the
data work stays inside each task's Spark plan, so orchestration adds
no shuffles, collects, or scale limits of its own.
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections.abc import Callable, Mapping, Sequence
from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any


@dataclass(frozen=True)
class TaskSpec:
    """``rehydrate`` restores a completed task's observable state on
    journal-resume: when a re-run skips the task, the orchestrator
    calls ``rehydrate(ctx)`` (in dependency order) and publishes its
    return value as ``ctx.results[name]`` — so downstream tasks that
    read upstream XCom values or upstream-registered temp views work
    across a process restart. Tasks without a ``rehydrate`` surface
    ``None`` in ``ctx.results`` when skipped: their downstream tasks
    must reload any upstream state themselves (e.g. re-read the
    table the upstream task wrote)."""

    name: str
    fn: Callable[["RunContext"], Any]
    depends_on: tuple[str, ...] = ()
    retries: int = 0
    retry_delay_sec: float = 0.0
    rehydrate: Callable[["RunContext"], Any] | None = None


@dataclass
class RunContext:
    """Handed to every task callable: the run's logical date, shared
    params, and upstream return values (Airflow's XCom)."""

    logical_date: str
    params: Mapping[str, Any]
    results: dict[str, Any]


@dataclass
class TaskResult:
    name: str
    state: str  # success | failed | skipped | upstream_failed
    attempts: int = 0
    error: str | None = None
    elapsed_sec: float = 0.0
    value: Any = None


@dataclass
class Dag:
    dag_id: str
    tasks: Sequence[TaskSpec]
    state_path: str | None = None
    params: Mapping[str, Any] = field(default_factory=dict)
    sleep: Callable[[float], None] = time.sleep

    def __post_init__(self) -> None:
        names = [t.name for t in self.tasks]
        if len(names) != len(set(names)):
            raise ValueError("duplicate task names")
        known = set(names)
        for t in self.tasks:
            missing = set(t.depends_on) - known
            if missing:
                raise ValueError(f"task {t.name}: unknown deps {sorted(missing)}")

    # ── journal ──
    def _journal(self) -> dict[str, list[str]]:
        if not self.state_path or not os.path.exists(self.state_path):
            return {}
        with open(self.state_path) as f:
            return json.load(f)

    def _record_success(self, logical_date: str, task: str) -> None:
        if not self.state_path:
            return
        j = self._journal()
        done = j.setdefault(f"{self.dag_id}:{logical_date}", [])
        if task not in done:
            done.append(task)
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(j, f)
        os.replace(tmp, self.state_path)

    def completed(self, logical_date: str) -> set[str]:
        return set(self._journal().get(f"{self.dag_id}:{logical_date}", []))

    # ── execution ──
    def order(self) -> list[TaskSpec]:
        by_name = {t.name: t for t in self.tasks}
        ts = TopologicalSorter({t.name: set(t.depends_on) for t in self.tasks})
        return [by_name[n] for n in ts.static_order()]

    def run(self, logical_date: str, max_parallel: int = 1) -> dict[str, TaskResult]:
        """Execute the DAG for one logical date. ``max_parallel > 1``
        runs READY tasks (all deps satisfied) concurrently from
        driver threads — Spark schedules jobs submitted by multiple
        threads concurrently, so independent branches overlap their
        cluster utilization exactly as Airflow's parallelism does."""
        if max_parallel > 1:
            return self._run_parallel(logical_date, max_parallel)
        done_before = self.completed(logical_date)
        ctx = RunContext(logical_date=logical_date, params=self.params, results={})
        results: dict[str, TaskResult] = {}
        failed: set[str] = set()
        for t in self.order():
            if t.name in done_before:
                results[t.name] = self._skip_task(t, ctx)
                if results[t.name].state == "failed":
                    failed.add(t.name)
                continue
            if any(d in failed for d in t.depends_on):
                results[t.name] = TaskResult(t.name, "upstream_failed")
                failed.add(t.name)
                continue
            results[t.name] = self._run_task(t, ctx)
            if results[t.name].state == "failed":
                failed.add(t.name)
            else:
                self._record_success(logical_date, t.name)
        return results

    def _run_parallel(self, logical_date: str, max_parallel: int) -> dict[str, TaskResult]:
        done_before = self.completed(logical_date)
        ctx = RunContext(logical_date=logical_date, params=self.params, results={})
        results: dict[str, TaskResult] = {}
        failed: set[str] = set()
        by_name = {t.name: t for t in self.tasks}
        lock = threading.Lock()  # guards ctx.results + journal writes
        ts = TopologicalSorter({t.name: set(t.depends_on) for t in self.tasks})
        ts.prepare()
        with ThreadPoolExecutor(max_workers=max_parallel) as pool:
            pending: dict = {}
            while ts.is_active():
                for name in ts.get_ready():
                    t = by_name[name]
                    if name in done_before:
                        results[name] = self._skip_task(t, ctx)
                        if results[name].state == "failed":
                            failed.add(name)
                        ts.done(name)
                    elif any(d in failed for d in t.depends_on):
                        results[name] = TaskResult(name, "upstream_failed")
                        failed.add(name)
                        ts.done(name)
                    else:
                        pending[pool.submit(self._run_task, t, ctx)] = name
                if not pending:
                    continue
                finished, _ = wait(pending, return_when=FIRST_COMPLETED)
                for fut in finished:
                    name = pending.pop(fut)
                    results[name] = fut.result()
                    if results[name].state == "failed":
                        failed.add(name)
                    else:
                        with lock:
                            self._record_success(logical_date, name)
                    ts.done(name)
        return results

    def _skip_task(self, t: TaskSpec, ctx: RunContext) -> TaskResult:
        """Journal-resume path: the task already succeeded for this
        logical date. Rehydrate its observable outputs (XCom value,
        temp-view registrations) so downstream tasks behave exactly
        as in the original run; a rehydration error fails the task
        (and thus its downstream) rather than letting consumers read
        a silently-empty ctx.results."""
        if t.rehydrate is None:
            # the documented contract: rehydrate-less skipped tasks
            # surface None (not a KeyError) to downstream readers
            ctx.results[t.name] = None
            return TaskResult(t.name, "skipped")
        try:
            value = t.rehydrate(ctx)
        except Exception as e:  # noqa: BLE001 — orchestrators contain task faults
            return TaskResult(t.name, "failed", 0, f"rehydrate: {type(e).__name__}: {e}")
        ctx.results[t.name] = value
        return TaskResult(t.name, "skipped", value=value)

    def _run_task(self, t: TaskSpec, ctx: RunContext) -> TaskResult:
        t0 = time.time()
        last_err: str | None = None
        for attempt in range(1, t.retries + 2):
            try:
                value = t.fn(ctx)
                ctx.results[t.name] = value
                return TaskResult(
                    t.name, "success", attempt, None, round(time.time() - t0, 3), value
                )
            except Exception as e:  # noqa: BLE001 — orchestrators contain task faults
                last_err = f"{type(e).__name__}: {e}"
                if attempt <= t.retries and t.retry_delay_sec:
                    self.sleep(t.retry_delay_sec * attempt)  # linear backoff
        return TaskResult(
            t.name, "failed", t.retries + 1, last_err, round(time.time() - t0, 3)
        )

    def backfill(self, logical_dates: Sequence[str]) -> dict[str, dict[str, TaskResult]]:
        """Ordered catch-up: one run per logical date, oldest first.
        Dates already fully green in the journal are skipped whole."""
        all_names = {t.name for t in self.tasks}
        out: dict[str, dict[str, TaskResult]] = {}
        for d in sorted(logical_dates):
            if self.completed(d) >= all_names:
                out[d] = {n: TaskResult(n, "skipped") for n in all_names}
                continue
            out[d] = self.run(d)
        return out


def dag_from_models(
    dag_id: str,
    runner: "ModelRunner",  # noqa: F821 — plans.models.ModelRunner
    state_path: str | None = None,
    retries: int = 0,
) -> Dag:
    """Wrap a ModelRunner's models as one orchestrated task each, so
    SQL model materialization gains retries/resume/backfill. Each
    task materializes exactly its model (dependency order is enforced
    by the DAG edges, mirroring dbt's ref() graph). On journal
    resume, skipped models REHYDRATE instead of vanishing: a
    table-materialized model re-registers its temp view over the
    parquet it already wrote, and a view model re-registers its SQL
    view — so downstream models' ``ref()``-by-name resolution works
    across a process restart (rehydration runs in dependency order,
    so a view model's upstream views exist when its SQL re-analyzes)."""
    import os as _os

    def _materialize(model):  # noqa: ANN001
        def _task(ctx: RunContext):
            single = type(runner)(
                spark=runner.spark, models=[model], table_root=runner.table_root
            )
            return single.run()[model.name]

        return _task

    def _rehydrate(model):  # noqa: ANN001
        def _restore(ctx: RunContext):
            if model.materialization == "table":
                path = _os.path.join(runner.table_root, model.name)
                df = runner.spark.read.parquet(path)
            else:  # view: re-analyze the SQL (lazy — no data work)
                df = runner.spark.sql(model.sql)
            df.createOrReplaceTempView(model.name)
            return df

        return _restore

    tasks = [
        TaskSpec(
            name=m.name,
            fn=_materialize(m),
            depends_on=tuple(d for d in m.depends_on if any(x.name == d for x in runner.models)),
            retries=retries,
            rehydrate=_rehydrate(m),
        )
        for m in runner.models
    ]
    return Dag(dag_id=dag_id, tasks=tasks, state_path=state_path)
