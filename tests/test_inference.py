"""Replicas + invariants for the inference batch: Kendall tau-b,
AR(1) forecast eval, k-fold target encoding, mix-shift decomposition,
calibration report."""

import math
from collections import defaultdict

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def _daily(sf):
    return duckdb.sql(
        f"SELECT CAST(o_orderdate AS DATE) d,"
        f" CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) rev,"
        f" count(*) n FROM '{sf}/orders.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()


def test_kendall_tau_matches_python_replica(spark):
    row = QS["kendall_tau_daily"](spark, SF_SMALL).collect()[0]
    daily = _daily(SF_SMALL)
    c = d = tx = ty = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            dx = daily[j][1] - daily[i][1]
            dy = daily[j][2] - daily[i][2]
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
    n0 = len(daily) * (len(daily) - 1) // 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))
    assert row["n_days"] == len(daily)
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert (row["tied_rev"], row["tied_cnt"]) == (tx, ty)
    assert abs(row["tau_b"] - round(tau, 6)) < 1e-12
    assert -1.0 <= row["tau_b"] <= 1.0


def test_ar1_beats_or_reports_naive(spark):
    row = QS["ar1_forecast_eval"](spark, SF_SMALL).collect()[0]
    daily = _daily(SF_SMALL)
    pairs = [(daily[i - 1][1], daily[i][1], daily[i][0]) for i in range(1, len(daily))]
    train = [(x, y) for x, y, d in pairs if str(d) < "2000-01-01"]
    test = [(x, y) for x, y, d in pairs if str(d) >= "2000-01-01"]
    assert row["n_train"] == len(train) and row["n_test"] == len(test)
    n = len(train)
    sx = sum(x for x, _ in train)
    sy = sum(y for _, y in train)
    sxx = sum(x * x for x, _ in train)
    sxy = sum(x * y for x, y in train)
    phi = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    c = sy / n - phi * (sx / n)
    assert abs(row["phi"] - round(phi, 6)) < 1e-12
    # expanded SSE == per-row SSE (the algebra the operator relies on)
    sse = sum((y - c - phi * x) ** 2 for x, y in test)
    assert abs(row["rmse_ar1"] - round(math.sqrt(sse / len(test)), 2)) < 0.02
    naive = math.sqrt(sum((y - x) ** 2 for x, y in test) / len(test))
    assert abs(row["rmse_naive"] - round(naive, 2)) < 1e-9


def test_target_encoding_leaves_own_fold_out(spark):
    rows = QS["target_encoding_kfold"](spark, SF_SMALL).collect()
    assert len(rows) == 25  # 5 types x 5 folds
    vals = duckdb.sql(
        f"SELECT event_type,"
        f" ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 5,"
        f" CAST(round(value * 10000) AS BIGINT) FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    cells = defaultdict(lambda: [0, 0])
    totals = defaultdict(lambda: [0, 0])
    for t, f, v in vals:
        for acc in (cells[(t, f)], totals[t]):
            acc[0] += 1
            acc[1] += v
    for r in rows:
        n_f, s_f = cells[(r["event_type"], r["fold"])]
        n_t, s_t = totals[r["event_type"]]
        assert r["n_rows"] == n_f
        expect = (s_t - s_f) / (n_t - n_f) / 10000.0
        assert abs(r["enc_value"] - round(expect, 6)) < 1e-12


def test_mix_shift_effects_sum_to_delta(spark):
    rows = QS["mix_shift_decomposition"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        # Laspeyres volume + Paasche price == total delta (to rounding)
        assert abs(r["volume_effect"] + r["price_effect"] - r["delta_rev"]) < 0.02
        if r["q1"] == 0:
            assert r["volume_effect"] == 0.0 and abs(r["price_effect"] - r["rev2"]) < 0.02


def test_calibration_bins_consistent(spark):
    rows = QS["calibration_report"](spark, SF_SMALL).collect()
    assert rows
    n = sum(r["n_docs"] for r in rows)
    ece = sum(abs(r["gap"]) * r["n_docs"] for r in rows) / n
    for r in rows:
        assert 0.0 <= r["avg_score"] <= 1.0
        assert 0.0 <= r["keep_rate"] <= 1.0
        assert abs(r["gap"] - round(r["keep_rate"] - r["avg_score"], 4)) < 2e-4
        assert 0.0 <= r["brier"] <= 1.0
        assert r["ece"] == rows[0]["ece"]  # corpus-level constant
    # ECE recomputed from (rounded) bins matches to rounding error
    assert abs(rows[0]["ece"] - ece) < 1e-3


def test_anova_matches_python_replica(spark):
    rows = {r["factor"]: r for r in QS["anova_oneway_value"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT event_type, CAST(isodow(ts) - 1 AS VARCHAR),"
        f" CAST(round(value * 10000) AS BIGINT) FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    for idx, factor in ((0, "event_type"), (1, "weekday")):
        groups = defaultdict(list)
        for t in data:
            groups[t[idx]].append(t[2])
        nt = sum(len(v) for v in groups.values())
        st = sum(sum(v) for v in groups.values())
        ssb = sum(sum(v) ** 2 / len(v) for v in groups.values()) - st**2 / nt
        ssw = sum(x * x for v in groups.values() for x in v) - sum(
            sum(v) ** 2 / len(v) for v in groups.values()
        )
        k = len(groups)
        f_stat = (ssb / (k - 1)) / (ssw / (nt - k))
        r = rows[factor]
        assert (r["n_groups"], r["n_rows"]) == (k, nt)
        assert abs(r["f_stat"] - round(f_stat, 6)) < 1e-6
        assert 0.0 <= r["eta_sq"] <= 1.0


def test_pettitt_matches_python_replica(spark):
    row = QS["pettitt_changepoint"](spark, SF_SMALL).collect()[0]
    daily = _daily(SF_SMALL)
    xs = [rev for _, rev, _ in daily]
    n = len(xs)
    best_k, best_day = -1, None
    u = 0
    for t in range(n - 1):
        # U_t via telescoping: add wins of day t against later days,
        # subtract wins against earlier days
        p = sum((xs[j] > xs[t]) - (xs[j] < xs[t]) for j in range(t + 1, n))
        q = sum((xs[t] > xs[i]) - (xs[t] < xs[i]) for i in range(t))
        u += p - q
        if abs(u) > best_k:
            best_k, best_day = abs(u), daily[t][0]
    assert row["n_days"] == n
    assert row["k_stat"] == best_k
    assert str(row["change_day"]) == str(best_day)
    assert 0.0 <= row["p_approx"] <= 1.0
