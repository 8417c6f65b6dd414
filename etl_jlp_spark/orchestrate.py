"""Minimal DAG orchestration for the medallion pipeline.

Reference: the Airflow deployment (dwh_lab/airflow.cfg, dwh_dag in
logs/scheduler/) chains ingest → preprocess → quality jobs. Spark
doesn't need an external scheduler for the intra-job graph — Catalyst
already executes the widest correct plan — so this orchestrator covers
the *inter*-job layer only: ordered steps with dependencies, per-step
timing/row-count metrics, and fail-fast with a job report (the
reference's quality-report JSON, generalized).

Steps are plain callables returning a DataFrame (materialized with a
count) or None (side-effecting writers). This is deliberately thin:
on a real deployment each `Step` maps 1:1 onto an Airflow/dbt task
invoking `spark-submit`; nothing here assumes a scheduler.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class Step:
    name: str
    fn: Callable[..., DataFrame | None]
    depends_on: tuple[str, ...] = ()
    # Airflow-task retry args (reference DAG dags/dwh_dag.py:180-250
    # sets retries/retry_delay per task): a transient failure re-runs
    # the step up to ``retries`` extra times with exponential backoff
    # (retry_backoff_sec, ×2 per attempt) before the DAG fail-fasts.
    retries: int = 0
    retry_backoff_sec: float = 0.0


@dataclass
class StepResult:
    name: str
    status: str
    seconds: float
    rows: int | None = None
    error: str | None = None
    attempts: int = 1


@dataclass
class Pipeline:
    name: str
    steps: list[Step] = field(default_factory=list)

    def step(
        self,
        name: str,
        depends_on: tuple[str, ...] = (),
        retries: int = 0,
        retry_backoff_sec: float = 0.0,
    ):
        def deco(fn):
            self.steps.append(Step(name, fn, depends_on, retries, retry_backoff_sec))
            return fn

        return deco

    def _ordered(self) -> list[Step]:
        done: list[Step] = []
        names: set[str] = set()
        pending = list(self.steps)
        while pending:
            progressed = False
            for s in list(pending):
                if all(d in names for d in s.depends_on):
                    done.append(s)
                    names.add(s.name)
                    pending.remove(s)
                    progressed = True
            if not progressed:
                cycle = [s.name for s in pending]
                raise ValueError(f"dependency cycle or missing dep among {cycle}")
        return done

    def run(self, on_error: Callable[[str, str], None] | None = None, **context) -> dict:
        """Execute in dependency order; fail-fast; return a job report.

        ``on_error(step_name, message)`` is the alert channel — the
        analog of the reference's send_email (general_lib.py:187-222) +
        log_etl_errors (quality_report.py:155-157). It fires once per
        failed step; the report carries the same messages under
        ``errors`` so a scheduler can route them without re-parsing
        step results. Alert failures are swallowed (an unreachable
        mail relay must not mask the real failure)."""
        results: list[StepResult] = []
        outputs: dict[str, DataFrame | None] = {}
        errors: list[dict] = []
        ok = True
        for s in self._ordered():
            if not ok:
                results.append(StepResult(s.name, "skipped", 0.0))
                continue
            t0 = time.perf_counter()
            msg = None
            for attempt in range(1, s.retries + 2):
                try:
                    out = s.fn(**context, upstream=outputs)
                    rows = out.count() if isinstance(out, DataFrame) else None
                    outputs[s.name] = out
                    results.append(
                        StepResult(
                            s.name,
                            "success",
                            round(time.perf_counter() - t0, 3),
                            rows,
                            attempts=attempt,
                        )
                    )
                    msg = None
                    break
                except Exception as e:
                    msg = str(e)[:500]
                    if attempt <= s.retries and s.retry_backoff_sec > 0:
                        time.sleep(s.retry_backoff_sec * 2 ** (attempt - 1))
            if msg is not None:  # retries exhausted → fail-fast
                ok = False
                results.append(
                    StepResult(
                        s.name,
                        "failed",
                        round(time.perf_counter() - t0, 3),
                        None,
                        msg,
                        attempts=s.retries + 1,
                    )
                )
                errors.append({"step": s.name, "error": msg, "attempts": s.retries + 1})
                # the alert fires ONCE, after the final attempt — a step
                # that eventually succeeds never alerts
                if on_error is not None:
                    try:
                        on_error(s.name, msg)
                    except Exception:
                        pass
        return {
            "pipeline": self.name,
            "status": "success" if ok else "failed",
            "steps": [vars(r) for r in results],
            "errors": errors,
        }

    def run_and_save(self, report_path: str, **context) -> dict:
        report = self.run(**context)
        with open(report_path, "w", encoding="utf-8") as f:
            json.dump(report, f, indent=2)
        return report


class AlertOutbox:
    """File-backed alert transport: the environment-portable analog of
    the reference's SMTP ``send_email`` (dwh_lab/dwh/general_lib.py:
    187-222, subject/body/recipients over smtplib). SMTP endpoints are
    deployment-specific, so the durable part — a structured, auditable
    record of every alert — lands in a JSONL outbox instead; a relay
    (or a swap to a webhook/SMTP callable) drains it without any change
    to pipeline code, because an outbox IS the ``on_error`` callable.

    Single-writer by construction (the orchestrator is sequential), so
    line-append is safe; ``read()`` returns the alerts for tests and
    for the relay."""

    def __init__(self, path: str, recipients: list[str] | None = None, sender: str = "etl-jlp"):
        self.path = path
        self.recipients = recipients or ["oncall@example.invalid"]
        self.sender = sender

    def __call__(self, step: str, message: str) -> None:
        record = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "sender": self.sender,
            "recipients": self.recipients,
            "subject": f"[ETL FAILURE] step={step}",
            "body": message,
        }
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")

    def read(self) -> list[dict]:
        try:
            with open(self.path, encoding="utf-8") as f:
                return [json.loads(line) for line in f if line.strip()]
        except FileNotFoundError:
            return []
