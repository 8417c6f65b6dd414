"""Semantic invariants for the nonparametric/diagnostics suite —
properties that must hold regardless of data, complementing the
DuckDB hash parity (which pins values but not meaning)."""

from pyspark.sql import functions as F

from etl_jlp_spark.catalog import load_table
from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_w1_helper_hand_example(spark):
    from etl_jlp_spark.plans.nonparam import w1_against_reference

    ref = spark.createDataFrame([("a", 0, 1)], "event_type string, v long, c long")
    cur = spark.createDataFrame([("a", 100, 1)], "event_type string, v long, c long")
    row = w1_against_reference(cur, ref).collect()[0]
    assert row["w1_dollars"] == 1.0  # one unit of mass moved one dollar
    same = w1_against_reference(ref, ref).collect()[0]
    assert same["w1_dollars"] == 0.0


def test_shapley_telescopes_to_total_conversions(spark):
    from etl_jlp_spark.plans.attribution import CONVERSION_TYPE, SHAPLEY_CHANNELS, SHAPLEY_DEN

    out = QS["shapley_channel_attribution"](spark, SF_SMALL).collect()
    ev = load_table(spark, SF_SMALL, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == CONVERSION_TYPE, 1).otherwise(0)).alias("conv"),
        F.max(F.when(F.col("event_type") != CONVERSION_TYPE, 1).otherwise(0)).alias("touched"),
    )
    v_full = per_user.agg(F.sum("conv")).collect()[0][0]
    v_empty = per_user.where(F.col("touched") == 0).agg(
        F.coalesce(F.sum("conv"), F.lit(0))
    ).collect()[0][0]
    assert sum(r["phi_num"] for r in out) == SHAPLEY_DEN * (v_full - v_empty)
    assert abs(sum(r["credit_share"] for r in out) - 1.0) < 1e-6
    assert len(out) == len(SHAPLEY_CHANNELS)


def test_runs_test_count_identities(spark):
    r = QS["runs_test_daily"](spark, SF_SMALL).collect()[0]
    assert r["n_above"] + r["n_below"] == r["n_days_used"]
    assert 1 <= r["n_runs"] <= r["n_days_used"]
    assert 1.0 <= r["expected_runs"] <= r["n_days_used"]


def test_cliffs_delta_pair_partition(spark):
    for r in QS["cliffs_delta_value"](spark, SF_SMALL).collect():
        assert r["gt_pairs"] + r["lt_pairs"] + r["tie_pairs"] == r["n_type"] * r["n_base"]
        assert -1.0 <= r["cliffs_delta"] <= 1.0


def test_abc_classes_partition_parts(spark):
    rows = QS["abc_inventory_class"](spark, SF_SMALL).collect()
    n_parts = (
        load_table(spark, SF_SMALL, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r["n_parts"] for r in rows) == n_parts
    assert abs(sum(r["rev_share"] for r in rows) - 1.0) < 1e-4
    by_class = {r["abc_class"]: r for r in rows}
    assert set(by_class) <= {"A", "B", "C"}
    if {"A", "C"} <= set(by_class):
        # A parts are fewer but richer per part than C parts
        a, c = by_class["A"], by_class["C"]
        assert a["revenue"] / a["n_parts"] > c["revenue"] / c["n_parts"]


def test_trimmed_mean_between_bounds(spark):
    r = QS["winsorized_trimmed_mean"](spark, SF_SMALL).collect()[0]
    assert r["k_trim"] == r["n_orders"] // 20
    for col in ("trimmed_mean", "winsorized_mean"):
        assert 0 < r[col]
    # trimming a right-skewed price distribution pulls the mean DOWN
    assert r["trimmed_mean"] <= r["mean_raw"]


def test_pps_selects_exactly_n_draws(spark):
    from etl_jlp_spark.operators.sampling import PPS_N_SEL

    rows = QS["pps_systematic_sample"](spark, SF_SMALL).collect()
    assert sum(r["times_selected"] for r in rows) == PPS_N_SEL
    assert len({r["l_partkey"] for r in rows}) == len(rows)


def test_hurst_in_plausible_band(spark):
    rows = QS["hurst_rs_exponent"](spark, SF_SMALL).collect()
    h = rows[0]["hurst_exponent"]
    assert all(r["hurst_exponent"] == h for r in rows)
    assert 0.0 < h < 1.5
    assert all(r["avg_rs"] > 0 for r in rows)


def test_fleiss_kappa_bounds_and_counts(spark):
    r = QS["fleiss_kappa_gates"](spark, SF_SMALL).collect()[0]
    assert r["all_drop"] + r["one_keep"] + r["two_keep"] + r["all_keep"] == r["n_docs"]
    assert -1.0 <= r["fleiss_kappa"] <= 1.0
    assert 0.0 <= r["p_bar"] <= 1.0


def test_capture_recapture_lists_cover_truth(spark):
    r = QS["capture_recapture_pairs"](spark, SF_SMALL).collect()[0]
    # every true pair is surfaced by SOME band, so the two lists cover it
    assert r["n_list_a"] + r["n_list_b"] >= r["n_true_pairs"]
    assert r["n_both"] <= min(r["n_list_a"], r["n_list_b"])
    assert r["chapman_estimate"] >= 0


def test_energy_and_cvm_nonnegative(spark):
    for name, col in (("energy_distance_drift", "energy_dollars"), ("cvm_drift_test", "cvm_t")):
        for r in QS[name](spark, SF_SMALL).collect():
            assert r[col] >= 0, (name, r)


def test_rbo_bounds(spark):
    r = QS["rank_biased_overlap"](spark, SF_SMALL).collect()[0]
    assert 0.0 <= r["rbo_truncated"] <= 1.0
    assert 0 <= r["n_common"] <= r["k"]


def test_markov_entropy_conditioning_helps(spark):
    r = QS["markov_entropy_rate"](spark, SF_SMALL).collect()[0]
    # conditioning can only reduce entropy (up to rounding)
    assert r["entropy_rate_nats"] <= r["marginal_entropy_nats"] + 1e-6
    assert r["n_states"] >= 1


def test_vocab_coverage_identities(spark):
    r = QS["vocab_coverage_estimate"](spark, SF_SMALL).collect()[0]
    assert r["chao1_vocab"] >= r["vocab_seen"]
    assert 0.0 <= r["gt_unseen_mass"] <= 1.0
    assert abs(r["gt_unseen_mass"] + r["gt_coverage"] - 1.0) < 1e-6


def test_friedman_rank_identities(spark):
    rows = QS["friedman_daily_ranks"](spark, SF_SMALL).collect()
    k = len(rows)
    assert k >= 2
    # within every complete day the ranks are a permutation of 1..k, so
    # the per-type mean ranks must average to (k+1)/2 (up to the 4-dp
    # rounding each mean_rank carries)
    assert abs(sum(r["mean_rank"] for r in rows) / k - (k + 1) / 2) < k * 1e-4
    for r in rows:
        assert 1.0 <= r["mean_rank"] <= k
        # chi2 = 12n/(k(k+1))·Σ(mean_rank−(k+1)/2)² ≥ 0 — the r7-ADVICE
        # regression pin (the off-by-0.5 rank made it go negative)
        assert r["friedman_chi2"] >= 0


def test_cliffs_delta_matches_exact_fraction_reference(spark):
    """cliffs_delta itself (not just the pair partition) must equal the
    exact-Fraction half-away rounding of (gt−lt)/(n·n_base) — the
    engine-version-proof integer discipline adopted after the round-8
    driver-hash incident on this exact query."""
    import math
    from fractions import Fraction

    from etl_jlp_spark.plans.nonparam import W1_ROUND

    scale = 10**W1_ROUND
    for r in QS["cliffs_delta_value"](spark, SF_SMALL).collect():
        num = int(r["gt_pairs"]) - int(r["lt_pairs"])
        den = int(r["n_type"]) * int(r["n_base"])
        x = Fraction(num * scale, den)
        e6 = math.floor(x + Fraction(1, 2)) if x >= 0 else -math.floor(-x + Fraction(1, 2))
        assert r["cliffs_delta"] == e6 / scale, (r, e6)
        # and the canon guarantee: never IEEE −0.0
        assert math.copysign(1.0, r["cliffs_delta"]) > 0 or r["cliffs_delta"] != 0.0


def test_anderson_darling_matches_exact_reference(spark):
    """anderson_darling_drift must equal an exact arbitrary-precision
    single-machine evaluation of its declared spec (e12 per-term
    half-away quantization, exact integer sum, e6 final half-away) —
    including the W1-family ref/cur split and tie grouping."""
    import datetime as dt
    from collections import defaultdict

    from etl_jlp_spark.plans.nonparam import AD_TERM_SCALE, W1_REF_DAYS, W1_ROUND

    from decimal import ROUND_HALF_UP, Decimal

    rows = load_table(spark, SF_SMALL, "events").select("event_type", "ts", "value").collect()
    d0 = min(r["ts"].date() for r in rows)
    cut = d0 + dt.timedelta(days=W1_REF_DAYS)
    counts = defaultdict(lambda: defaultdict(lambda: [0, 0]))  # type -> v -> [ca, cb]
    for r in rows:
        # the ENGINES' cents binning (F.round / DuckDB round): HALF_UP on
        # the shortest-repr decimal — Python round() is half-to-EVEN and
        # would shift the grid one bin on exact half-cent doubles
        v = int(Decimal(repr(r["value"] * 100)).quantize(Decimal(1), rounding=ROUND_HALF_UP))
        side = 0 if r["ts"].date() < cut else 1
        counts[r["event_type"]][v][side] += 1

    def halfaway(num: int, den: int) -> int:
        assert num >= 0 and den > 0
        return (2 * num + den) // (2 * den)

    want = {}
    for ty, grid in counts.items():
        na = sum(c[0] for c in grid.values())
        nb = sum(c[1] for c in grid.values())
        n_tot = na + nb
        cuma = cumn = 0
        s_t = 0
        for v in sorted(grid):
            ca, cb = grid[v]
            cuma += ca
            cumn += ca + cb
            if cumn == n_tot:  # last grid point: 0/0 term, excluded
                continue
            gap = cuma * n_tot - cumn * na
            s_t += halfaway(AD_TERM_SCALE * (ca + cb) * gap * gap, cumn * (n_tot - cumn))
        rem = AD_TERM_SCALE // 10**W1_ROUND
        want[ty] = halfaway(s_t, na * nb * rem) / 10**W1_ROUND

    got = {r["event_type"]: r for r in QS["anderson_darling_drift"](spark, SF_SMALL).collect()}
    assert set(got) == set(want)
    for ty in want:
        assert got[ty]["ad_stat"] == want[ty], (ty, got[ty]["ad_stat"], want[ty])
        assert got[ty]["ad_stat"] >= 0.0


def test_seasonal_mann_kendall_matches_exact_reference(spark):
    """seasonal_mann_kendall's S, variance terms and z must equal an
    exact single-machine Hirsch–Slack computation over the collected
    daily series (weekday = Python date.weekday(), 0=Monday — the same
    convention as F.weekday / isodow-1)."""
    import math
    from collections import defaultdict

    from etl_jlp_spark.plans.nonparam import W1_ROUND
    from etl_jlp_spark.plans.inference import _daily

    rows = _daily(spark, SF_SMALL).select("day", "rev").collect()
    by_w = defaultdict(list)
    for r in rows:
        by_w[r["day"].weekday()].append((r["day"], r["rev"]))
    s_stat = 0
    base = 0
    tie = 0
    for days in by_w.values():
        days.sort()
        n = len(days)
        base += n * (n - 1) * (2 * n + 5)
        cnt = defaultdict(int)
        for _, rev in days:
            cnt[rev] += 1
        tie += sum(t * (t - 1) * (2 * t + 5) for t in cnt.values() if t > 1)
        for i in range(n):
            for j in range(i + 1, n):
                d = days[j][1] - days[i][1]
                s_stat += (d > 0) - (d < 0)
    row = QS["seasonal_mann_kendall"](spark, SF_SMALL).collect()[0]
    assert row["s_stat"] == s_stat
    assert row["n_days"] == len(rows)
    assert row["n_seasons"] == len(by_w)
    var = (base - tie) / 18.0
    assert row["var_s"] == round(var, 2)
    corr = s_stat - 1 if s_stat > 0 else (s_stat + 1 if s_stat < 0 else 0)
    assert abs(row["z_stat"] - round(corr / math.sqrt(var), W1_ROUND)) < 1e-12
    assert row["trend"] in ("increasing", "decreasing", "no_trend")
