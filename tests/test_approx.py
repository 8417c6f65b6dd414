"""Approx sketches must honor the accuracy contract the oracle asserts.

The query itself now emits within-bound booleans (HLL vs exact distinct,
approx_percentile vs exact rank interval) — the driver oracle hashes them
against literal TRUE, and this test asserts the same contract locally plus
the exact-anchor columns.
"""

from tests.conftest import SF_MEDIUM

import __spark_entry__ as ent

QS = ent.queries()


def test_approx_within_bounds(spark):
    rows = {r["event_type"]: r for r in QS["approx_sketch_stats"](spark, SF_MEDIUM).collect()}
    exact_pct = {r["event_type"]: r for r in QS["percentile_stats"](spark, SF_MEDIUM).collect()}
    assert set(rows) == set(exact_pct)
    for et, a in rows.items():
        assert a["users_within_bound"], et
        assert a["p50_within_bound"], et
        assert a["p99_within_bound"], et
        assert a["n_events"] > 0 and a["exact_users"] > 0
