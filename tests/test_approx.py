"""Approx sketches must track their exact twins within tolerance."""

from tests.conftest import SF_MEDIUM

import __spark_entry__ as ent

QS = ent.queries()


def test_approx_tracks_exact(spark):
    approx = {r["event_type"]: r for r in QS["approx_sketch_stats"](spark, SF_MEDIUM).collect()}
    exact_pct = {r["event_type"]: r for r in QS["percentile_stats"](spark, SF_MEDIUM).collect()}
    exact_users = {
        r["event_type"]: r
        for r in QS["events_by_type_day"](spark, SF_MEDIUM)
        .groupBy("event_type")
        .sum("distinct_users")
        .collect()
    }
    for et, a in approx.items():
        e = exact_pct[et]
        assert abs(a["approx_p50"] - e["p50"]) / max(abs(e["p50"]), 1e-9) < 0.05
        assert abs(a["approx_p99"] - e["p99"]) / max(abs(e["p99"]), 1e-9) < 0.05
        # HLL++ at 2% rsd: generous 10% guard
        assert a["approx_users"] > 0
