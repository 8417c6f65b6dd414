"""Known-answer tests for the round-6 time-series operators
(anomaly_zscore, ewma_daily_revenue) on tiny synthetic frames; the
sf0.001/sf0.01 DuckDB parity runs through test_parity.py like every
registered query."""

from __future__ import annotations

import datetime as dt

import __spark_entry__ as ent
from etl_jlp_spark.plans import timeseries as ts
from tests.conftest import SF_SMALL

QS = ent.queries()


def _events(spark, day_counts, event_type="view"):
    """day_counts: {day_offset: n_rows} → a minimal events frame."""
    rows = []
    eid = 0
    for off, n in day_counts.items():
        day = dt.datetime(2024, 1, 1) + dt.timedelta(days=off)
        for i in range(n):
            rows.append((eid, day + dt.timedelta(minutes=i), eid % 7, event_type, 1.0, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _orders(spark, day_revenue):
    rows = [
        (i, i % 5, "F", rev, dt.date(2024, 1, 1) + dt.timedelta(days=off), "1-URGENT")
        for i, (off, rev) in enumerate(day_revenue.items())
    ]
    return spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    )


def test_anomaly_zscore_flags_spike_and_skips_coldstart(spark, monkeypatch):
    # days 0-13: noisy-but-calm counts; day 14: 10x spike
    counts = {i: 5 + (i % 2) for i in range(14)}
    counts[14] = 50
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: _events(spark, counts))
    out = {r["day"]: r for r in ts.anomaly_zscore(spark, "unused").collect()}
    # first LOOKBACK days have no full baseline → no rows
    assert min(out) == dt.date(2024, 1, 8)
    spike = out[dt.date(2024, 1, 15)]
    assert spike["is_anomaly"] and spike["zscore"] > ts.ZSCORE_THRESHOLD
    calm = out[dt.date(2024, 1, 10)]
    assert not calm["is_anomaly"] and abs(calm["zscore"]) <= ts.ZSCORE_THRESHOLD


def test_anomaly_zscore_flat_baseline_deviation_is_flagged(spark, monkeypatch):
    # constant 5/day baseline (std = 0), then a jump: z is undefined but
    # the day must still be flagged
    counts = {i: 5 for i in range(10)}
    counts[10] = 9
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: _events(spark, counts))
    out = {r["day"]: r for r in ts.anomaly_zscore(spark, "unused").collect()}
    jump = out[dt.date(2024, 1, 11)]
    assert jump["zscore"] is None and jump["is_anomaly"]
    flat = out[dt.date(2024, 1, 9)]
    assert flat["zscore"] is None and not flat["is_anomaly"]


def test_ewma_constant_series_is_identity(spark, monkeypatch):
    rev = {i: 100.0 for i in range(20)}
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: _orders(spark, rev))
    out = ts.ewma_daily_revenue(spark, "unused").collect()
    assert len(out) == 20
    # renormalization over present lags ⇒ no cold-start bias anywhere
    assert all(abs(r["ewma_revenue"] - 100.0) < 1e-9 for r in out)


def test_ewma_known_two_day_answer(spark, monkeypatch):
    rev = {0: 100.0, 1: 200.0}
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: _orders(spark, rev))
    out = {r["day"]: r["ewma_revenue"] for r in ts.ewma_daily_revenue(spark, "unused").collect()}
    a = ts.EWMA_ALPHA
    assert abs(out[dt.date(2024, 1, 1)] - 100.0) < 1e-9
    expect = round((200.0 + 100.0 * (1 - a)) / (1 + (1 - a)), 4)
    assert abs(out[dt.date(2024, 1, 2)] - expect) < 1e-9


def test_transition_matrix_rows_are_conditional_distributions(spark):
    rows = QS["event_transition_matrix"](spark, SF_SMALL).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
        assert 0.0 <= r["p_next"] <= 1.0 and 0.0 <= r["p_joint"] <= 1.0
    for prev, grp in by_prev.items():
        assert abs(sum(g["p_next"] for g in grp) - 1.0) < 0.01, prev
    assert abs(sum(r["p_joint"] for r in rows) - 1.0) < 0.01


def test_burstiness_bounds_and_ks_sanity(spark):
    for r in QS["interarrival_burstiness"](spark, SF_SMALL).collect():
        assert -1.0 <= r["burstiness"] < 1.0
        assert r["n_gaps"] >= 2 and r["mean_gap_s"] > 0
    for r in QS["ks_drift_report"](spark, SF_SMALL).collect():
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert 0.0 <= r["p_value"] <= 1.0


def test_mann_whitney_rank_identity(spark):
    r = QS["mann_whitney_ab"](spark, SF_SMALL).collect()[0]
    n = r["n_a"] + r["n_b"]
    total = r["n_a"] * r["mean_rank_a"] + r["n_b"] * r["mean_rank_b"]
    assert abs(total - n * (n + 1) / 2.0) < 1.0
    assert 0.0 <= r["p_approx"] <= 1.0
    assert 0 <= r["u_a"] <= r["n_a"] * r["n_b"]


def test_holt_linear_series_learns_the_slope(spark, monkeypatch):
    """On an exactly linear daily series y = 100 + 10t, Holt's trend
    converges to the slope and the one-step forecast to the next
    value; with l0=y0, b0=0 the transient decays geometrically, so by
    t=40 the trend is within 0.1 of 10."""
    rows = [
        (i, 1, dt.datetime(2024, 1, 1, 12) + dt.timedelta(days=i), "view", 100.0 + 10.0 * i, "{}")
        for i in range(40)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: ev)
    out = ts.holt_linear_eval(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 40
    assert abs(r["trend"] - 10.0) < 0.1
    assert abs(r["forecast_next"] - (100.0 + 10.0 * 40)) < 0.5
    assert abs(r["level"] - (100.0 + 10.0 * 39)) < 0.5


def test_holt_two_day_hand_answer(spark, monkeypatch):
    """y = [100, 200]: l1 = α·200 + (1−α)·100, b1 = β(l1−100),
    err = 100."""
    rows = [
        (0, 1, dt.datetime(2024, 1, 1, 12), "view", 100.0, "{}"),
        (1, 1, dt.datetime(2024, 1, 2, 12), "view", 200.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double, props string"
    )
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: ev)
    r = ts.holt_linear_eval(spark, "unused").collect()[0]
    a, b = ts.HOLT_ALPHA, ts.HOLT_BETA
    l1 = a * 200.0 + (1 - a) * 100.0
    assert abs(r["level"] - round(l1, 4)) < 1e-9
    assert abs(r["trend"] - round(b * (l1 - 100.0), 4)) < 1e-9
    assert abs(r["mae_holt"] - 100.0) < 1e-9
    assert abs(r["rmse_holt"] - 100.0) < 1e-9


def test_weekday_index_averages_to_one(spark):
    rows = QS["weekday_seasonality_index"](spark, SF_SMALL).collect()
    assert {r["weekday"] for r in rows} <= set(range(7))
    # weighted by day counts, indices must average to 1
    tot = sum(r["n_days"] for r in rows)
    wavg = sum(r["seasonality_index"] * r["n_days"] for r in rows) / tot
    assert abs(wavg - 1.0) < 0.01


def test_mad_anomaly_is_robust_to_one_spike(spark, monkeypatch):
    """49 calm days at 5±1 events + one 40x day: the spike must be the
    ONLY flag (the trailing-mean zscore would widen its own baseline)."""
    counts = {i: 5 + (i % 2) for i in range(49)}
    counts[49] = 200
    monkeypatch.setattr(ts, "load_table", lambda s, d, n: _events(spark, counts))
    out = {r["day"]: r for r in ts.anomaly_mad_daily(spark, "unused").collect()}
    flagged = [d for d, r in out.items() if r["is_anomaly"]]
    assert flagged == [dt.date(2024, 1, 1) + dt.timedelta(days=49)]
    assert out[flagged[0]]["robust_z"] > ts.MAD_THRESHOLD
