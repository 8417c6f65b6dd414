"""Python replicas + invariants for the round-8 profiling/advisor
batch: readability, partition sizing, value masks, streaks, chi-square
mix drift."""

import math
import re
from collections import Counter, defaultdict

import duckdb
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()


def _runs(s: str, pat: str) -> int:
    return len(re.findall(pat, s))


def test_readability_matches_python_replica(spark):
    rows = {r["source"]: r for r in QS["readability_report"](spark, SF_SMALL).collect()}
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, sents, sylls
    for _, text, source in _docs():
        t = text.strip().lower()
        if not t:
            continue
        a = agg[source]
        a[0] += 1
        a[1] += len(re.split(r"\s+", t))
        a[2] += max(_runs(t, r"[.!?]+"), 1)
        a[3] += max(_runs(t, r"[aeiou]+"), 1)
    assert set(rows) == set(agg)
    for src, (nd, w, s, y) in agg.items():
        r = rows[src]
        assert (r["n_docs"], r["tot_words"], r["tot_sentences"], r["tot_syllables"]) == (
            nd, w, s, y,
        )
        flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r["flesch_ease"] - round(flesch, 4)) < 1e-9


def test_readability_natural_band(spark):
    # synthetic corpus should stay in a sane band (not template soup)
    for r in QS["readability_report"](spark, SF_SMALL).collect():
        assert r["words_per_sentence"] >= 1.0
        assert 0.0 < r["syllables_per_word"] < 10.0


def test_partition_advisor_invariants(spark):
    rows = QS["partition_size_advisor"](spark, SF_SMALL).collect()
    assert rows
    byts = sorted(r["est_bytes"] for r in rows)
    n = len(byts)
    med = (byts[n // 2] if n % 2 else (byts[n // 2 - 1] + byts[n // 2]) / 2)
    for r in rows:
        # ceil at the 64 KiB test target
        assert r["files_needed"] == math.ceil(r["est_bytes"] / 65536)
        assert abs(r["bytes_vs_median"] - round(r["est_bytes"] / med, 4)) < 1e-9
        assert r["skewed"] == (r["est_bytes"] > 2 * med)
        assert r["est_bytes"] >= 32 * r["n_rows"]  # fixed-width floor


def test_value_mask_collapses_formats(spark):
    rows = QS["value_mask_profile"](spark, SF_SMALL).collect()
    by_col = defaultdict(list)
    for r in rows:
        by_col[(r["tbl"], r["col"])].append(r)
    # customer names are uniformly Customer#NNNN → one dominant mask
    cust = by_col[("customer", "c_name")]
    assert cust[0]["mask"] == "A#9"
    assert cust[0]["share"] == 1.0
    for cell in by_col.values():
        ranks = sorted(r["rk"] for r in cell)
        assert ranks == list(range(1, len(ranks) + 1))
        assert sum(r["share"] for r in cell) <= 1.0 + 1e-9


def test_streaks_match_python_replica(spark):
    rows = {r["streak_len"]: r for r in QS["user_active_streaks"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) FROM '{SF_SMALL}/events.parquet'"
    ).fetchall()
    days = defaultdict(list)
    for u, d in data:
        days[u].append(d)
    streaks = Counter()
    users_at = defaultdict(set)
    peak = Counter()
    for u, ds in days.items():
        ds.sort()
        lens, cur = [], 1
        for a, b in zip(ds, ds[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                lens.append(cur)
                cur = 1
        lens.append(cur)
        for ln in lens:
            streaks[ln] += 1
            users_at[ln].add(u)
        peak[max(lens)] += 1
    assert set(rows) == set(streaks)
    for ln, r in rows.items():
        assert r["n_streaks"] == streaks[ln]
        assert r["n_users"] == len(users_at[ln])
        assert r["n_users_peak"] == peak.get(ln, 0)


def test_chisq_nonnegative_and_consistent(spark):
    rows = QS["priority_mix_chisq"](spark, SF_SMALL).collect()
    total = rows[0]["chi2_total"]
    assert all(r["chi2_total"] == total for r in rows)
    assert abs(sum(r["chi2_contrib"] for r in rows) - total) < 1e-2
    for r in rows:
        assert r["chi2_contrib"] >= 0.0
        assert r["dof"] > 0
        assert 0.0 <= r["cramers_v"] <= 1.0
