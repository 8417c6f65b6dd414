"""Invariant tests for the CRM / audit analytics (rfm_segmentation,
assoc_rules_events, benford_digit_report); cross-engine value parity
runs through test_parity.py like every registered query."""

from __future__ import annotations

from collections import Counter

import __spark_entry__ as ent
from tests.conftest import SF_SMALL

QS = ent.queries()


def test_rfm_quintiles_are_balanced_and_ordered(spark):
    rows = QS["rfm_segmentation"](spark, SF_SMALL).collect()
    n = len(rows)
    assert n == 150
    for axis in ("r_seg", "f_seg", "m_seg"):
        sizes = Counter(r[axis] for r in rows)
        assert set(sizes) == {1, 2, 3, 4, 5}, axis
        assert max(sizes.values()) - min(sizes.values()) <= 1, axis
    # axis orderings: a seg-1 customer on each axis beats a seg-5 one
    by_r = sorted(rows, key=lambda r: (r["r_seg"], r["days_since"]))
    assert by_r[0]["days_since"] <= by_r[-1]["days_since"]
    best_m = min(r["m_seg"] for r in rows)
    worst_m = max(r["m_seg"] for r in rows)
    assert max(r["monetary"] for r in rows if r["m_seg"] == worst_m) <= min(
        r["monetary"] for r in rows if r["m_seg"] == best_m
    )
    for r in rows:
        assert r["rfm"] == f"{r['r_seg']}{r['f_seg']}{r['m_seg']}"


def test_assoc_rules_identities(spark):
    rows = QS["assoc_rules_events"](spark, SF_SMALL).collect()
    sup = {(r["antecedent"], r["consequent"]): r for r in rows}
    for (a, b), r in sup.items():
        # joint counts are symmetric; confidence/lift are not
        assert sup[(b, a)]["n_both"] == r["n_both"], (a, b)
        assert 0.0 < r["confidence"] <= 1.0
        assert r["support"] <= r["confidence"] + 1e-9
        assert r["lift"] > 0


def test_benford_report_is_a_distribution(spark):
    rows = QS["benford_digit_report"](spark, SF_SMALL).collect()
    assert {r["digit"] for r in rows} <= set(range(1, 10))
    assert abs(sum(r["share"] for r in rows) - 1.0) < 0.001
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 0.001
    chi2 = {r["chi2_total"] for r in rows}
    assert len(chi2) == 1 and chi2.pop() >= 0.0
