"""Replicas + invariants for the ML-eval batch: centroid silhouette,
Heaps vocabulary growth, quality-score PR curve."""

import math
import re
from collections import defaultdict

import duckdb
import numpy as np

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_silhouette_matches_numpy_replica(spark):
    rows = {r["label"]: r for r in QS["centroid_silhouette_report"](spark, SF_SMALL).collect()}
    data = duckdb.sql(
        f"SELECT label, embedding FROM '{SF_SMALL}/embeddings.parquet'"
    ).fetchall()
    by_label = defaultdict(list)
    for lab, v in data:
        by_label[lab].append(np.array(v, dtype=np.float64))
    cents = {
        lab: np.round(np.mean(np.stack(vs), axis=0), 6) for lab, vs in by_label.items()
    }
    for lab, vs in by_label.items():
        a_s, b_s, sils, misplaced = [], [], [], 0
        for v in vs:
            dists = {
                cl: round(math.sqrt(max(float(np.dot(v - c, v - c)), 0.0)), 6)
                for cl, c in cents.items()
            }
            a = dists[lab]
            b = min(d for cl, d in dists.items() if cl != lab)
            s = round((b - a) / max(a, b), 6)
            a_s.append(a)
            b_s.append(b)
            sils.append(s)
            misplaced += s < 0
        r = rows[lab]
        assert r["n_vecs"] == len(vs)
        assert abs(r["mean_intra"] - round(sum(a_s) / len(a_s), 4)) < 1e-3
        assert abs(r["mean_inter"] - round(sum(b_s) / len(b_s), 4)) < 1e-3
        assert abs(r["mean_silhouette"] - round(sum(sils) / len(sils), 4)) < 1e-3
        assert r["n_misplaced"] == misplaced
        # silhouette bounded
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_vocab_growth_matches_python_replica(spark):
    rows = sorted(
        QS["vocab_growth_curve"](spark, SF_SMALL).collect(), key=lambda r: r["bucket"]
    )
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMALL}/documents.parquet'"
    ).fetchall()
    toks_by_bucket = defaultdict(list)
    for doc_id, text in docs:
        words = re.findall(r"[a-z]+", text.lower())
        toks_by_bucket[doc_id // 50].extend(
            " ".join(words[i : i + 3]) for i in range(len(words) - 2)
        )
    seen: set = set()
    cum_tok = 0
    for r in rows:
        toks = toks_by_bucket[r["bucket"]]
        new = {t for t in toks if t not in seen}
        assert r["bucket_ngrams"] == len(toks)
        assert r["new_terms"] == len(new)
        cum_tok += len(toks)
        seen |= new
        assert r["cum_ngrams"] == cum_tok
        assert r["cum_distinct"] == len(seen)
        assert abs(r["novelty_rate"] - round(len(new) / len(toks), 4)) < 1e-9
    # heaps beta for natural-ish text: strictly between 0 and 1 — but the
    # fit needs >= 2 curve points (sf0.001 has a single 50-doc bucket)
    if len(rows) >= 2:
        assert 0.0 < rows[0]["heaps_beta"] < 1.0
    assert all(r["heaps_beta"] == rows[0]["heaps_beta"] for r in rows)


def test_vocab_growth_beta_band_at_sf001(spark):
    from tests.conftest import SF_MEDIUM

    rows = QS["vocab_growth_curve"](spark, SF_MEDIUM).collect()
    assert len(rows) >= 2
    assert 0.0 < rows[0]["heaps_beta"] < 1.0


def test_pr_curve_monotone_and_consistent(spark):
    rows = sorted(
        QS["quality_score_pr_curve"](spark, SF_SMALL).collect(),
        key=lambda r: r["threshold"],
    )
    n_keep = rows[0]["n_keep"]
    assert all(r["n_keep"] == n_keep for r in rows)
    for lo, hi in zip(rows, rows[1:]):
        # raising the threshold can only shrink the predicted set
        assert hi["n_pred"] <= lo["n_pred"]
        assert hi["tp"] <= lo["tp"]
        # recall is non-increasing in the threshold
        if lo["recall"] is not None and hi["recall"] is not None:
            assert hi["recall"] <= lo["recall"] + 1e-9
    for r in rows:
        assert r["tp"] <= min(r["n_pred"], r["n_keep"])
        if r["precision"] is not None:
            assert 0.0 <= r["precision"] <= 1.0
        if r["f1"] is not None and r["precision"] and r["recall"]:
            f1 = 2 * r["tp"] / (r["n_pred"] + r["n_keep"])
            assert abs(r["f1"] - round(f1, 4)) < 1e-9


def test_char_coverage_matches_python_replica(spark):
    from collections import Counter

    rows = {r["target"]: r for r in QS["char_coverage_report"](spark, SF_SMALL).collect()}
    docs = duckdb.sql(f"SELECT text FROM '{SF_SMALL}/documents.parquet'").fetchall()
    counts = Counter()
    for (t,) in docs:
        if t:
            counts.update(t.lower())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(counts.values())
    for target in (0.995, 0.999):
        cum = 0
        needed = None
        cum_at = None
        for i, (_, c) in enumerate(ranked, start=1):
            cum += c
            if cum >= target * tot:
                needed, cum_at = i, cum
                break
        r = rows[target]
        assert r["alphabet_size"] == len(ranked)
        assert r["chars_needed"] == needed
        assert r["chars_dropped"] == len(ranked) - needed
        assert abs(r["residual_unk_rate"] - round(1.0 - cum_at / tot, 6)) < 1e-9


def test_winnowing_matches_python_replica(spark):
    """Rightmost-min winnowing replica + the SIGMOD'03 guarantee: the
    selected set must contain the min of EVERY window, density near
    2/(W+1)."""
    import hashlib

    K, W = 8, 8
    rows = {r["source"]: r for r in QS["winnowing_fingerprint_stats"](spark, SF_SMALL).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, source, lower(text) FROM '{SF_SMALL}/documents.parquet'"
        f" WHERE length(text) >= {K + W - 1}"
    ).fetchall()
    per_source = defaultdict(lambda: [set(), 0, 0])  # docs, grams, fps
    fp_docs = defaultdict(set)
    for doc_id, source, t in docs:
        hs = [
            int(hashlib.md5(t[i : i + K].encode()).hexdigest()[:8], 16)
            for i in range(len(t) - K + 1)
        ]
        sel = set()
        for s in range(len(hs) - W + 1):
            window = hs[s : s + W]
            m = min(window)
            # rightmost occurrence of the minimum
            pos = s + max(j for j, v in enumerate(window) if v == m)
            sel.add((pos, m))
        agg = per_source[source]
        agg[0].add(doc_id)
        agg[1] += len(hs)
        agg[2] += len(sel)
        for _, h in sel:
            fp_docs[h].add(doc_id)
    shared = sum(1 for ds in fp_docs.values() if len(ds) >= 2)
    for source, (ds, grams, fps) in per_source.items():
        r = rows[source]
        assert r["n_docs"] == len(ds)
        assert r["n_grams"] == grams
        assert r["n_fingerprints"] == fps
        assert abs(r["density"] - round(fps / grams, 4)) < 1e-9
        assert r["n_shared_hashes"] == shared
        # density should sit near the theoretical 2/(W+1)
        assert 0.5 * 2 / (W + 1) < r["density"] < 3 * 2 / (W + 1)
