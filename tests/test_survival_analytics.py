"""Structural properties of the round-7 analytics operators — the
invariants a correct Kaplan-Meier / CUSUM / attribution must satisfy
regardless of data, complementing the DuckDB value-hash oracles."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_km_survival_is_a_valid_survival_curve(spark):
    rows = (
        QS["session_survival_km"](spark, SF_SMALL)
        .orderBy("session_len_events")
        .collect()
    )
    assert rows, "no completed session lengths at sf0.001"
    prev_s, prev_n = 1.0, None
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9  # monotone nonincreasing
        assert 1 <= r["n_completed"] <= r["n_at_risk"]
        if prev_n is not None:
            assert r["n_at_risk"] <= prev_n  # at-risk shrinks with length
        prev_s, prev_n = r["survival"], r["n_at_risk"]


def test_km_counts_reconcile_with_sessionization(spark):
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.sessionize import with_session_id

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts")
    per_sess = with_session_id(ev).groupBy("user_id", "session_id").count()
    n_sessions = per_sess.count()
    n_users = per_sess.select("user_id").distinct().count()
    total_completed = (
        QS["session_survival_km"](spark, SF_SMALL).agg(F.sum("n_completed")).first()[0]
    )
    # every session completes except each user's (censored) last one
    assert total_completed == n_sessions - n_users


def test_cusum_sums_to_zero_and_flags_argmax(spark):
    rows = QS["cusum_changepoint"](spark, SF_SMALL).orderBy("day").collect()
    assert rows
    # the full-series CUSUM ends at zero by construction (sum of
    # standardized deviations about the mean); rounding leaves dust
    assert abs(rows[-1]["cusum"]) <= 0.01 * len(rows)
    peak = max(abs(r["cusum"]) for r in rows)
    for r in rows:
        assert r["is_changepoint"] == (abs(r["cusum"]) == peak)
    assert any(r["is_changepoint"] for r in rows)


def test_attribution_conserves_conversions(spark):
    from etl_jlp_spark.catalog import load_table

    out = QS["session_conversion_attribution"](spark, SF_SMALL)
    total = out.agg(F.sum("n_conversions")).first()[0]
    purchases = (
        load_table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == purchases  # every purchase credited exactly once
    assert out.filter(F.col("channel") == "purchase").count() == 0


def test_isolation_outliers_flag_matches_threshold(spark):
    from etl_jlp_spark.operators.quality_rules import ISO_THRESHOLD

    rows = QS["quality_isolation_outliers"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["iso_score"] >= 0.0
        # rounded score straddling the threshold is the only legal
        # disagreement between flag and displayed score
        if r["iso_score"] >= ISO_THRESHOLD + 0.001:
            assert r["is_outlier"]
        if r["iso_score"] <= ISO_THRESHOLD - 0.001:
            assert not r["is_outlier"]
