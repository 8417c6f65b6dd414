"""Replicas + invariants for robust stats, bottom-k sample quantiles,
and the k-anonymity audit."""

import hashlib
import math
from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_robust_stats_match_python_replica(spark):
    rows = {r["priority"]: r for r in QS["robust_revenue_stats"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT o_orderpriority, CAST(round(o_totalprice*100) AS BIGINT), o_orderkey"
        f" FROM '{SF_SMALL}/orders.parquet'"
    ).fetchall()
    by_p = defaultdict(list)
    for p, c, k in data:
        by_p[p].append((c, k))
    for p, vals in by_p.items():
        vals.sort()
        cents = [c for c, _ in vals]
        n = len(cents)
        lo = math.floor(0.1 * n)
        mid = cents[lo : n - lo]
        wins = [cents[lo]] * lo + mid + [cents[n - lo - 1]] * lo
        r = rows[p]
        assert r["n_orders"] == n
        assert r["n_trimmed_each_side"] == lo
        assert abs(r["mean_usd"] - round(sum(cents) / (100.0 * n), 2)) < 1e-6
        assert abs(r["trimmed_mean_usd"] - round(sum(mid) / (100.0 * len(mid)), 2)) < 1e-6
        assert abs(r["winsorized_mean_usd"] - round(sum(wins) / (100.0 * n), 2)) < 1e-6
        # robust estimates bracket sanity: trimming pulls toward the median
        assert r["trimmed_mean_usd"] > 0 and r["winsorized_mean_usd"] > 0


def test_bottomk_quantiles_match_python_replica(spark):
    rows = {r["event_type"]: r for r in QS["bottomk_sample_quantiles"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT event_type, event_id, value FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    by_t = defaultdict(list)
    for t, eid, v in data:
        hv = int(hashlib.md5(str(eid).encode()).hexdigest()[:8], 16)
        by_t[t].append((hv, v))

    def interp_q(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        lo, hi = int(math.floor(pos)), int(math.ceil(pos))
        return vals[lo] + (vals[hi] - vals[lo]) * (pos - lo)

    for t, hvvals in by_t.items():
        hvvals.sort()
        sample = [v for _, v in hvvals[:64]]
        allv = [v for _, v in hvvals]
        r = rows[t]
        assert r["n_sample"] == min(64, len(allv))
        assert abs(r["est_p50"] - round(interp_q(sample, 0.5), 4)) < 1e-6
        assert abs(r["exact_p90"] - round(interp_q(allv, 0.9), 4)) < 1e-6
        assert abs(r["err_p50"] - round(abs(interp_q(sample, 0.5) - interp_q(allv, 0.5)), 4)) < 1e-3


def test_k_anonymity_monotone_in_k(spark):
    rows = sorted(QS["k_anonymity_report"](spark, SF_SMALL).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [2, 5, 10]
    n_classes = rows[0]["n_classes"]
    for r in rows:
        assert r["n_classes"] == n_classes
        assert 0 <= r["n_classes_at_risk"] <= n_classes
        assert 0.0 <= r["rows_at_risk_share"] <= 1.0
        assert r["min_class_size"] >= 1
    for lo, hi in zip(rows, rows[1:]):
        # raising k can only add at-risk classes/rows
        assert hi["n_classes_at_risk"] >= lo["n_classes_at_risk"]
        assert hi["n_rows_at_risk"] >= lo["n_rows_at_risk"]
