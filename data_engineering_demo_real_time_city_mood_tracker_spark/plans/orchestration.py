"""Thin orchestration layer: gate → trigger DAG semantics.

The reference drives its pipelines with Airflow: a quality-check DAG
that *triggers* the downstream report DAG when the gate passes
(my_airflow/dags/mood_quality_check.py:47-73, TriggerDagRunOperator)
and per-DAG schedule/retry metadata (my_airflow/dags/
daily_summary_report.py:53-70). This module re-expresses those
semantics as a deterministic, dependency-free core the engine can be
driven by — topological execution, per-task retries, upstream gating,
failure alerts, and cross-DAG triggering — without importing a
scheduler. Schedule strings are carried as metadata for the host
scheduler (cron/Airflow/ASK) to act on; nothing here sleeps or
daemonizes.

Everything is injectable for tests: the clock (``sleep``), the
failure ``notifier`` (same shape as run_with_alert), and the task
callables themselves.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass
class Task:
    """One node: ``fn`` runs when every upstream succeeded.

    ``retries``/``retry_delay_sec`` mirror Airflow's task-level retry
    metadata; the delay is applied through the injected sleep so tests
    run instantly.
    """

    name: str
    fn: Callable[[], object]
    upstream: list[str] = field(default_factory=list)
    retries: int = 0
    retry_delay_sec: float = 0.0


@dataclass
class Dag:
    """A named task collection plus schedule metadata (cron string,
    carried not executed — parity with the reference's
    ``schedule_interval='0 23 * * *'``)."""

    name: str
    schedule: str | None = None
    tasks: dict[str, Task] = field(default_factory=dict)

    def add(
        self,
        name: str,
        fn: Callable[[], object],
        upstream: list[str] | None = None,
        retries: int = 0,
        retry_delay_sec: float = 0.0,
    ) -> "Dag":
        if name in self.tasks:
            raise ValueError(f"duplicate task {name!r} in dag {self.name!r}")
        for u in upstream or []:
            if u not in self.tasks:
                raise ValueError(f"task {name!r}: unknown upstream {u!r}")
        self.tasks[name] = Task(name, fn, list(upstream or []), retries, retry_delay_sec)
        return self


def run_dag(
    dag: Dag,
    notifier: Callable[[str], None] | None = None,
    sleep: Callable[[float], None] | None = None,
) -> dict[str, dict]:
    """Execute a DAG: declaration order is already topological (``add``
    rejects forward references), so one pass suffices — no scheduler
    loop. Returns per-task state:

    ``{"state": "success"|"failed"|"skipped", "attempts": n,
    "result": ..., "error": ...}``

    Failure semantics match the reference DAGs: a failed task (after
    exhausting retries) notifies once via ``notifier`` (the Slack-
    webhook shape of run_with_alert) and every transitive downstream
    task is SKIPPED, never run; other branches continue.
    """
    sleep = sleep or (lambda s: None)
    states: dict[str, dict] = {}
    for t in dag.tasks.values():
        if any(states[u]["state"] != "success" for u in t.upstream):
            states[t.name] = {"state": "skipped", "attempts": 0, "result": None, "error": None}
            continue
        attempts = 0
        while True:
            attempts += 1
            try:
                result = t.fn()
                states[t.name] = {
                    "state": "success", "attempts": attempts, "result": result, "error": None,
                }
                break
            except Exception as exc:
                if attempts <= t.retries:
                    sleep(t.retry_delay_sec)
                    continue
                states[t.name] = {
                    "state": "failed", "attempts": attempts, "result": None,
                    "error": f"{type(exc).__name__}: {exc}",
                }
                if notifier is not None:
                    notifier(
                        ":x: *Task Failed!*\n"
                        f"*Dag*: `{dag.name}`\n"
                        f"*Task*: `{t.name}`\n"
                        f"*Error*: `{states[t.name]['error']}`"
                    )
                break
    return states


def gate_and_trigger(
    gate: Callable[[], bool],
    downstream: Dag,
    notifier: Callable[[str], None] | None = None,
    sleep: Callable[[float], None] | None = None,
) -> dict:
    """The reference's quality-gate pattern (mood_quality_check.py:
    47-73): evaluate ``gate``; when it returns truthy, trigger the
    downstream DAG (TriggerDagRunOperator semantics — a fresh
    ``run_dag``); when falsy or raising, do NOT trigger and alert.

    Returns ``{"gate": "passed"|"failed", "triggered": bool,
    "downstream": run_dag-states or None}``.
    """
    try:
        ok = bool(gate())
        err = None
    except Exception as exc:
        ok, err = False, f"{type(exc).__name__}: {exc}"
    if not ok:
        if notifier is not None:
            notifier(
                ":x: *Quality gate failed!*\n"
                f"*Downstream dag*: `{downstream.name}` (not triggered)\n"
                + (f"*Error*: `{err}`" if err else "*Gate returned false*")
            )
        return {"gate": "failed", "triggered": False, "downstream": None}
    return {
        "gate": "passed",
        "triggered": True,
        "downstream": run_dag(downstream, notifier=notifier, sleep=sleep),
    }
