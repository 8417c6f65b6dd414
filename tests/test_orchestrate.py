"""End-to-end medallion job through the orchestrator: ingest →
preprocess → quality, mirroring the reference's Airflow DAG."""

import json

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table
from etl_jlp_spark.ingest.writers import write_entity
from etl_jlp_spark.orchestrate import Pipeline
from etl_jlp_spark.plans.pipeline import preprocess_events
from etl_jlp_spark.quality.report import QualityReport


def _build(spark, out_dir):
    p = Pipeline("events_medallion")

    @p.step("ingest")
    def ingest(upstream, **_):
        return load_table(spark, SF_SMALL, "events")

    @p.step("preprocess", depends_on=("ingest",))
    def preprocess(upstream, **_):
        return preprocess_events(upstream["ingest"])

    @p.step("load_bronze", depends_on=("preprocess",))
    def load_bronze(upstream, **_):
        write_entity(
            upstream["preprocess"], out_dir, "streaming-sources", "events", "parquet", "20240201"
        )
        return None

    @p.step("quality", depends_on=("preprocess",))
    def quality(upstream, **_):
        qr = QualityReport(upstream["preprocess"], "events")
        qr.check_nulls(["user_id", "ts", "session_id"])
        qr.check_default_values({"source_id": 1})
        rep = qr.generate()
        assert rep["nulls_session_id"] == 0
        return None

    return p


def test_pipeline_runs_in_order(spark, tmp_path):
    p = _build(spark, str(tmp_path))
    report = p.run_and_save(str(tmp_path / "report.json"))
    assert report["status"] == "success"
    names = [s["name"] for s in report["steps"]]
    assert names.index("ingest") < names.index("preprocess") < names.index("load_bronze")
    assert all(s["status"] == "success" for s in report["steps"])
    saved = json.loads((tmp_path / "report.json").read_text())
    assert saved["pipeline"] == "events_medallion"
    # bronze output readable and audit-stamped
    bronze = spark.read.parquet(
        str(tmp_path / "streaming-sources/events/parquet/20240201")
    )
    assert bronze.filter(F.col("source_id") != 1).count() == 0


def test_pipeline_fail_fast_marks_downstream_skipped(spark, tmp_path):
    p = Pipeline("failing")

    @p.step("a")
    def a(upstream, **_):
        raise RuntimeError("boom")

    @p.step("b", depends_on=("a",))
    def b(upstream, **_):
        return None

    report = p.run()
    assert report["status"] == "failed"
    assert report["steps"][0]["status"] == "failed"
    assert report["steps"][1]["status"] == "skipped"


def test_cycle_detection(spark):
    p = Pipeline("cyclic")

    @p.step("x", depends_on=("y",))
    def x(**_):
        return None

    @p.step("y", depends_on=("x",))
    def y(**_):
        return None

    with pytest.raises(ValueError, match="cycle"):
        p.run()


def test_on_error_alert_hook(spark):
    """The send_email/log_etl_errors analog: failed steps fire the alert
    callback and land in the report's errors list."""
    p = Pipeline("alerting")

    @p.step("a")
    def a(upstream, **_):
        raise RuntimeError("kaboom")

    alerts = []
    report = p.run(on_error=lambda step, msg: alerts.append((step, msg)))
    assert alerts and alerts[0][0] == "a" and "kaboom" in alerts[0][1]
    assert report["errors"] == [{"step": "a", "error": "kaboom", "attempts": 1}]


def test_on_error_failure_does_not_mask(spark):
    p = Pipeline("alert-fails")

    @p.step("a")
    def a(upstream, **_):
        raise RuntimeError("real failure")

    def bad_alert(step, msg):
        raise OSError("mail relay down")

    report = p.run(on_error=bad_alert)
    assert report["status"] == "failed"
    assert report["errors"][0]["error"] == "real failure"


def test_retry_with_backoff_then_success():
    """A step failing twice then succeeding must be retried (attempts
    recorded), succeed overall, and never alert."""
    from etl_jlp_spark.orchestrate import Pipeline

    p = Pipeline("retry-ok")
    calls = {"n": 0}
    alerts = []

    @p.step("flaky", retries=3, retry_backoff_sec=0.01)
    def flaky(upstream):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return None

    report = p.run(on_error=lambda s, m: alerts.append((s, m)))
    assert report["status"] == "success"
    assert report["steps"][0]["attempts"] == 3
    assert calls["n"] == 3
    assert alerts == []


def test_retries_exhausted_alerts_once_and_fails_fast():
    from etl_jlp_spark.orchestrate import Pipeline

    p = Pipeline("retry-fail")
    calls = {"n": 0}
    alerts = []

    @p.step("doomed", retries=2, retry_backoff_sec=0.01)
    def doomed(upstream):
        calls["n"] += 1
        raise RuntimeError("permanent")

    @p.step("downstream", depends_on=("doomed",))
    def downstream(upstream):
        return None

    report = p.run(on_error=lambda s, m: alerts.append((s, m)))
    assert report["status"] == "failed"
    assert calls["n"] == 3  # 1 + 2 retries
    assert report["steps"][0]["attempts"] == 3
    assert report["errors"] == [{"step": "doomed", "error": "permanent", "attempts": 3}]
    assert len(alerts) == 1  # exactly one alert, after the final attempt
    assert report["steps"][1]["status"] == "skipped"


def test_alert_outbox_records_failures_as_mail_shaped_jsonl(tmp_path):
    from etl_jlp_spark.orchestrate import AlertOutbox, Pipeline

    outbox = AlertOutbox(str(tmp_path / "outbox.jsonl"), recipients=["dwh@example.invalid"])
    p = Pipeline("outbox-demo")

    @p.step("good")
    def good(upstream, **ctx):
        return None

    @p.step("flaky", depends_on=["good"], retries=1)
    def flaky(upstream, **ctx):
        raise RuntimeError("boom")

    report = p.run(on_error=outbox)
    assert report["status"] == "failed"
    alerts = outbox.read()
    # exactly ONE alert, fired after the final attempt
    assert len(alerts) == 1
    a = alerts[0]
    assert a["subject"] == "[ETL FAILURE] step=flaky"
    assert "boom" in a["body"]
    assert a["recipients"] == ["dwh@example.invalid"]
    assert a["ts"].endswith("Z")


def test_alert_outbox_empty_when_all_green(tmp_path):
    from etl_jlp_spark.orchestrate import AlertOutbox, Pipeline

    outbox = AlertOutbox(str(tmp_path / "outbox.jsonl"))
    p = Pipeline("green")

    @p.step("only")
    def only(upstream, **ctx):
        return None

    assert p.run(on_error=outbox)["status"] == "success"
    assert outbox.read() == []


# ---------------------------------------------------------------------------
# schedule / calendar semantics
# ---------------------------------------------------------------------------


def test_cron_next_fire_basic_shapes():
    from datetime import datetime

    from etl_jlp_spark.orchestrate import CronSchedule

    t = datetime(2026, 8, 13, 10, 7)
    assert CronSchedule("0 6 * * *").next_fire(t) == datetime(2026, 8, 14, 6, 0)
    assert CronSchedule("*/15 * * * *").next_fire(t) == datetime(2026, 8, 13, 10, 15)
    assert CronSchedule("30 2 1 * *").next_fire(t) == datetime(2026, 9, 1, 2, 30)
    # weekdays only: 2026-08-14 is a Friday, 15th/16th are weekend
    wd = CronSchedule("0 9 * * 1-5")
    assert wd.next_fire(datetime(2026, 8, 14, 9, 0)) == datetime(2026, 8, 17, 9, 0)
    # 7 accepted as Sunday
    assert CronSchedule("0 0 * * 7").next_fire(t) == datetime(2026, 8, 16, 0, 0)
    # exact-minute boundary is STRICTLY after
    assert CronSchedule("7 10 * * *").next_fire(datetime(2026, 8, 13, 10, 7)) == datetime(
        2026, 8, 14, 10, 7
    )


def test_cron_dom_dow_or_rule():
    """When BOTH day-of-month and day-of-week are restricted, classic
    cron matches if EITHER does."""
    from datetime import datetime

    from etl_jlp_spark.orchestrate import CronSchedule

    s = CronSchedule("0 0 13 * 5")  # the 13th OR any Friday
    assert s.matches(datetime(2026, 8, 13, 0, 0))  # a Thursday, but the 13th
    assert s.matches(datetime(2026, 8, 14, 0, 0))  # a Friday, not the 13th
    assert not s.matches(datetime(2026, 8, 15, 0, 0))  # Saturday the 15th


def test_cron_rejects_bad_expressions():
    import pytest as _pytest

    from etl_jlp_spark.orchestrate import CronSchedule

    for bad in ("0 6 * *", "61 * * * *", "* * 0 * *", "*/0 * * * *", "5/2 * * * *"):
        with _pytest.raises(ValueError):
            CronSchedule(bad)


def test_due_runs_catchup_semantics():
    """A run's logical date is its interval START and it becomes due at
    the interval END; a 3-day outage on a daily schedule yields 3 due
    runs in order (catchup) or just the newest (catchup=False)."""
    from datetime import datetime

    from etl_jlp_spark.orchestrate import CronSchedule

    s = CronSchedule("0 6 * * *")
    last = datetime(2026, 8, 10, 6, 0)
    now = datetime(2026, 8, 13, 12, 0)
    assert s.due_runs(last, now) == [
        datetime(2026, 8, 11, 6, 0),
        datetime(2026, 8, 12, 6, 0),
        # the Aug 13 06:00 interval is still OPEN at noon (ends Aug 14)
    ]
    assert s.due_runs(last, now, catchup=False) == [datetime(2026, 8, 12, 6, 0)]
    # nothing ran yet: exactly the newest COMPLETE interval
    assert s.due_runs(None, now) == [datetime(2026, 8, 12, 6, 0)]
    # fully caught up: no runs due
    assert s.due_runs(datetime(2026, 8, 12, 6, 0), now) == []


def test_run_on_schedule_persists_state_and_is_idempotent(tmp_path):
    """The poller must execute one pipeline run per due interval with
    logical_date injected, persist state after each, and be a no-op on
    re-poll with an unchanged clock (crash-safe catchup bookkeeping)."""
    from datetime import datetime

    from etl_jlp_spark.orchestrate import CronSchedule, Pipeline, run_on_schedule

    seen = []
    pipe = Pipeline("scheduled")

    @pipe.step("only")
    def only(logical_date=None, data_interval_end=None, upstream=None):
        seen.append((logical_date, data_interval_end))
        return None

    s = CronSchedule("0 6 * * *")
    state = str(tmp_path / "dagrun_state.json")
    now = datetime(2026, 8, 13, 12, 0)

    # first poll: nothing ran yet → newest complete interval only
    reports = run_on_schedule(pipe, s, state, now)
    assert [r["logical_date"] for r in reports] == ["2026-08-12T06:00:00"]
    assert seen == [(datetime(2026, 8, 12, 6, 0), datetime(2026, 8, 13, 6, 0))]
    assert all(r["status"] == "success" for r in reports)

    # re-poll, same clock: idempotent no-op
    assert run_on_schedule(pipe, s, state, now) == []

    # two days later: the backlog catches up in order
    later = datetime(2026, 8, 15, 7, 0)
    reports = run_on_schedule(pipe, s, state, later)
    assert [r["logical_date"] for r in reports] == [
        "2026-08-13T06:00:00",
        "2026-08-14T06:00:00",
    ]


def test_observed_preprocess_metrics_reconcile(spark):
    from tests.conftest import SF_SMALL
    from etl_jlp_spark.plans.pipeline import observed_preprocess

    rows, metrics = observed_preprocess(spark, SF_SMALL)
    m_in, m_out = metrics["input"], metrics["output"]
    # observation rode along with the materializing job — counts match
    assert m_out["n_rows"] == len(rows)
    assert m_in["n_rows"] >= m_out["n_rows"]  # dedup only drops
    assert m_in["null_user_ids"] == 0
    total = round(sum(r["value"] for r in rows), 2)
    assert abs(m_out["total_value"] - total) < 0.05
