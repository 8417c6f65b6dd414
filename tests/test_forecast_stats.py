"""Replicas + invariants for the stats/forecast-eval batch: CV OLS,
Bayesian A/B, periodogram, conformal intervals."""

import hashlib
import math
from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_ols_cv_matches_python_replica(spark):
    rows = {r["fold"]: r for r in QS["ols_cv_eval"](spark, SF_SMALL).collect()}
    pts = duckdb.sql(
        f"SELECT l_orderkey % 4, CAST(round(l_discount*100) AS BIGINT),"
        f" CAST(round(l_extendedprice) AS BIGINT) FROM '{SF_SMALL}/lineitem.parquet'"
    ).fetchall()
    stats = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n sx sy sxx sxy syy
    for f, x, y in pts:
        s = stats[f]
        s[0] += 1
        s[1] += x
        s[2] += y
        s[3] += x * x
        s[4] += x * y
        s[5] += y * y
    tot = [sum(s[i] for s in stats.values()) for i in range(6)]
    sse_sum = n_sum = 0.0
    for f, s in stats.items():
        tn, tsx, tsy, tsxx, tsxy = (tot[i] - s[i] for i in range(5))
        b = (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx)
        a = tsy / tn - b * (tsx / tn)
        sse = s[5] - 2 * a * s[2] - 2 * b * s[4] + 2 * a * b * s[1] + a * a * s[0] + b * b * s[3]
        r = rows[f]
        assert r["n_test"] == s[0]
        assert abs(r["slope_usd_per_pct"] - round(b, 6)) < 1e-9
        assert abs(r["test_mse"] - round(sse / s[0], 2)) < 1e-6
        sse_sum += sse
        n_sum += s[0]
    assert abs(rows[0]["cv_mse"] - round(sse_sum / n_sum, 2)) < 1e-6


def test_bayesian_ab_matches_python_replica(spark):
    rows = {r["variant"]: r for r in QS["bayesian_ab_conversion"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT user_id, max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)"
        f" FROM '{SF_SMALL}/events.parquet' GROUP BY user_id"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])
    for u, c in data:
        v = "A" if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" else "B"
        cells[v][0] += 1
        cells[v][1] += c
    assert set(rows) == set(cells)
    pms, pss = {}, {}
    for v, (n, c) in cells.items():
        pm = (1.0 + c) / (2.0 + n)
        ps = math.sqrt((1.0 + c) * (1.0 + n - c) / ((2.0 + n) ** 2 * (3.0 + n)))
        pms[v], pss[v] = pm, ps
        r = rows[v]
        assert (r["n_users"], r["n_converted"]) == (n, c)
        assert abs(r["posterior_mean"] - round(pm, 4)) < 1e-9
        assert r["ci_lo"] < r["posterior_mean"] < r["ci_hi"]
    z = (pms["B"] - pms["A"]) / math.sqrt(pss["A"] ** 2 + pss["B"] ** 2)
    assert abs(rows["A"]["z_b_minus_a"] - round(z, 4)) < 1e-9


def test_periodogram_shares_sum_to_one(spark):
    rows = QS["periodogram_daily_revenue"](spark, SF_SMALL).collect()
    assert len(rows) == 9
    assert abs(sum(r["power_share"] for r in rows) - 1.0) < 1e-3
    ranked = sorted(rows, key=lambda r: r["rank"])
    for lo, hi in zip(ranked, ranked[1:]):
        assert lo["power_share"] >= hi["power_share"] - 1e-9
    assert all(2 <= r["period_days"] <= 10 for r in rows)


def test_conformal_coverage_near_target(spark):
    r = QS["conformal_forecast_interval"](spark, SF_SMALL).first()
    assert r["n_cal"] > 0 and r["n_eval"] > 0
    # split sizes consistent with the 70% rule (±1 for flooring)
    total = r["n_cal"] + r["n_eval"]
    assert abs(r["n_cal"] - math.floor(0.7 * total)) <= 1
    assert r["q_usd"] > 0
    # exchangeable residuals ⇒ coverage within a loose CLT band of 0.9
    se = math.sqrt(0.9 * 0.1 / r["n_eval"])
    assert abs(r["coverage"] - 0.9) < 6 * se + 0.02
    assert r["target"] == 0.9
