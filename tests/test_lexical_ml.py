"""Pure-Python/NumPy replicas for the round-6 lexical/ML batch:
Naive-Bayes langid, TF-IDF more-like-this, HLL register union, and the
char-class profile — each checked against an implementation that shares
NO code (and no SQL) with the Spark side or the DuckDB oracle."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table

import __spark_entry__ as ent

QS = ent.queries()


def _docs(spark):
    return load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "text", "lang", "source"
    ).collect()


def test_nb_langid_confusion_matches_python(spark):
    rows = _docs(spark)
    toks = {}
    for r in rows:
        t = re.split(r"\s+", r["text"].lower().strip(" "))
        toks[r["doc_id"]] = [w for w in t if w] if r["text"].strip(" ") else []
    cnt = defaultdict(Counter)  # lang -> word -> c
    nd = Counter()
    for r in rows:
        nd[r["lang"]] += 1
        cnt[r["lang"]].update(toks[r["doc_id"]])
    vocab = set(w for c in cnt.values() for w in c)
    totals = {l: sum(c.values()) for l, c in cnt.items()}
    v = len(vocab)
    confusion = Counter()
    for r in rows:
        tk = toks[r["doc_id"]]
        if not tk:
            continue
        best = None
        for lang in sorted(nd):
            s = math.log(nd[lang]) - len(tk) * math.log(totals[lang] + v)
            s += sum(math.log(cnt[lang][w] + 1) for w in tk if cnt[lang][w] > 0)
            if best is None or s > best[0] + 1e-12:
                best = (s, lang)
        confusion[(r["lang"], best[1])] += 1
    got = {
        (r["declared_lang"], r["predicted_lang"]): r
        for r in QS["nb_langid_confusion"](spark, SF_SMALL).collect()
    }
    assert {k: v for k, v in confusion.items()} == {
        k: r["n_docs"] for k, r in got.items()
    }
    per_declared = Counter()
    for (d, _), n in confusion.items():
        per_declared[d] += n
    for (d, p), r in got.items():
        assert math.isclose(
            r["row_share"], round(confusion[(d, p)] / per_declared[d], 4), abs_tol=1e-9
        )


def test_doc_similarity_tfidf_matches_numpy(spark):
    rows = _docs(spark)
    tf = {}
    df = Counter()
    for r in rows:
        terms = Counter(re.findall(r"[a-z]+", r["text"].lower()))
        tf[r["doc_id"]] = terms
        df.update(terms.keys())
    n = float(len(rows))
    vecs = {}
    for d, terms in tf.items():
        v = {t: c * (math.log((1 + n) / (1 + df[t])) + 1.0) for t, c in terms.items()}
        nrm = math.sqrt(sum(x * x for x in v.values()))
        vecs[d] = (v, nrm)
    queries = [
        d for d in tf if hashlib.md5(str(d).encode()).hexdigest()[:2] < "08"
    ]
    got = defaultdict(list)
    for r in QS["doc_similarity_tfidf_topk"](spark, SF_SMALL).collect():
        got[r["query_doc"]].append((r["rk"], r["match_doc"], r["cos_sim"]))
    assert set(got) <= set(queries)
    for q in queries:
        qv, qn = vecs[q]
        sims = []
        for d, (dv, dn) in vecs.items():
            if d == q or dn == 0 or qn == 0:
                continue
            dot = sum(w * dv.get(t, 0.0) for t, w in qv.items())
            sims.append((round(dot / (qn * dn), 4), d))
        if not sims:
            assert q not in got
            continue
        sims.sort(key=lambda x: (-x[0], x[1]))
        expect = [(i + 1, d, s) for i, (s, d) in enumerate(sims[:3])]
        assert sorted(got[q]) == expect, q


def test_hll_weekly_union_is_register_max(spark):
    """The weekly estimate must equal an estimate computed from
    Python-replicated md5 registers unioned by max — and sit within
    the m=64 error envelope of the exact count."""
    from etl_jlp_spark.operators.sketches import HLL_M, _HLL_ALPHA, _HLL_REST_BITS

    ev = (
        load_table(spark, SF_SMALL, "events")
        .select(F.col("ts").cast("date").alias("day"), "event_id")
        .collect()
    )
    regs = defaultdict(dict)  # week -> bucket -> max rho
    exact = defaultdict(set)
    for r in ev:
        day = r["day"]
        week = day - __import__("datetime").timedelta(days=day.weekday())
        h = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:15], 16)
        bucket, rest = h % HLL_M, h // HLL_M
        rho = (_HLL_REST_BITS + 1) if rest == 0 else (_HLL_REST_BITS + 1 - rest.bit_length())
        regs[week][bucket] = max(regs[week].get(bucket, 0), rho)
        exact[week].add(r["event_id"])
    got = {r["week"]: r for r in QS["hll_weekly_union"](spark, SF_SMALL).collect()}
    assert set(got) == set(regs)
    for week, reg in regs.items():
        z = sum(2.0 ** -m for m in reg.values())
        v = HLL_M - len(reg)
        raw = _HLL_ALPHA * HLL_M * HLL_M / (z + v)
        est = HLL_M * math.log(HLL_M / v) if (raw <= 2.5 * HLL_M and v > 0) else raw
        assert math.isclose(got[week]["est_distinct"], round(est, 4), abs_tol=1e-9)
        assert got[week]["exact_distinct"] == len(exact[week])
        # 64-register HLL: ~1.04/sqrt(64) = 13% std error; allow 4 sigma
        assert abs(got[week]["rel_err"]) < 0.52


def test_script_char_profile_matches_python(spark):
    rows = _docs(spark)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0])  # docs, chars, letter, digit, space
    for r in rows:
        a = agg[r["source"]]
        a[0] += 1
        a[1] += len(r["text"])
        a[2] += sum(1 for ch in r["text"].lower() if "a" <= ch <= "z")
        a[3] += sum(1 for ch in r["text"] if ch.isdigit())
        a[4] += r["text"].count(" ")
    got = {r["source"]: r for r in QS["script_char_profile"](spark, SF_SMALL).collect()}
    assert set(got) == set(agg)
    for src, (n, c, le, di, sp) in agg.items():
        g = got[src]
        assert (g["n_docs"], g["total_chars"]) == (n, c)
        assert math.isclose(g["letter_ratio"], round(le / c, 4), abs_tol=1e-9)
        assert math.isclose(g["digit_ratio"], round(di / c, 4), abs_tol=1e-9)
        assert math.isclose(g["space_ratio"], round(sp / c, 4), abs_tol=1e-9)
        assert math.isclose(g["other_ratio"], round((c - le - di - sp) / c, 4), abs_tol=1e-9)


def test_customer_order_concurrency_matches_python(spark):
    orders = load_table(spark, SF_SMALL, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    ).collect()
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_shipdate").collect()
    last_ship = {}
    for r in li:
        k = r["l_orderkey"]
        d = r["l_shipdate"]
        if hasattr(d, "date"):
            d = d.date()
        last_ship[k] = max(last_ship.get(k, d), d)
    from datetime import timedelta

    spans = defaultdict(list)
    for r in orders:
        if r["o_orderkey"] in last_ship:
            od = r["o_orderdate"]
            if hasattr(od, "date"):
                od = od.date()
            spans[r["o_custkey"]].append((od, last_ship[r["o_orderkey"]]))
    hist = Counter()
    for cust, ivs in spans.items():
        deltas = Counter()
        for s, e in ivs:
            deltas[s] += 1
            deltas[e + timedelta(days=1)] -= 1
        run = best = 0
        for d in sorted(deltas):
            run += deltas[d]
            best = max(best, run)
        hist[best] += 1
    got = {r["max_open"]: r for r in QS["customer_order_concurrency"](spark, SF_SMALL).collect()}
    assert {k: r["n_customers"] for k, r in got.items()} == dict(hist)
    total = sum(hist.values())
    for k, r in got.items():
        assert math.isclose(r["customer_share"], round(hist[k] / total, 4), abs_tol=1e-9)


def test_contrastive_triplets_properties(spark):
    """Positives are the anchor's best near-dup partner; negatives come
    from the md5 pool, are never the anchor, and never a known partner."""
    from etl_jlp_spark.operators.sampling import TRIPLET_NEG_POOL

    pairs = QS["dedup_minhash_lsh"](spark, SF_SMALL).collect()
    partners = defaultdict(dict)
    for r in pairs:
        partners[r["doc_a"]][r["doc_b"]] = r["jaccard"]
        partners[r["doc_b"]][r["doc_a"]] = r["jaccard"]
    all_docs = [r["doc_id"] for r in _docs(spark)]
    pool = sorted(all_docs, key=lambda d: (_md5_hex(str(d)), d))[:TRIPLET_NEG_POOL]
    got = QS["contrastive_triplets"](spark, SF_SMALL).collect()
    assert {r["anchor"] for r in got} == set(partners)
    for r in got:
        a = r["anchor"]
        best_j = max(partners[a].values())
        expect_pos = min(p for p, j in partners[a].items() if j == best_j)
        assert (r["positive"], r["pos_jaccard"]) == (expect_pos, best_j)
        cands = [
            c for c in pool if c != a and c not in partners[a]
        ]
        expect_neg = min(cands, key=lambda c: (_md5_hex(f"{a}:{c}"), c))
        assert r["negative"] == expect_neg


def _md5_hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_term_freq_spectrum_matches_python(spark):
    from etl_jlp_spark.operators.corpus_stats import FREQ_SPECTRUM_MAX_K

    rows = _docs(spark)
    df_counts = Counter()
    for r in rows:
        toks = [t for t in r["text"].lower().strip(" ").split() if t]
        df_counts.update({" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)})
    spec = Counter(c for c in df_counts.values() if c <= FREQ_SPECTRUM_MAX_K)
    n_tokens = sum(df_counts.values())
    n_types = len(df_counts)
    got = {r["k"]: r for r in QS["term_freq_spectrum"](spark, SF_SMALL).collect()}
    assert set(got) == set(spec)
    for k, nk in spec.items():
        g = got[k]
        assert g["n_types_k"] == nk
        assert math.isclose(g["type_share"], round(nk / n_types, 6), abs_tol=1e-9)
        assert math.isclose(g["token_share"], round(k * nk / n_tokens, 6), abs_tol=1e-9)
        gt = round((k + 1) * spec.get(k + 1, 0) / nk / n_tokens, 8)
        assert math.isclose(g["gt_prob_per_type"], gt, abs_tol=1e-12), k


def test_source_vocab_overlap_matches_python(spark):
    rows = _docs(spark)
    vocab = defaultdict(set)
    for r in rows:
        vocab[r["source"]].update(re.findall(r"[a-z]+", r["text"].lower()))
    got = {
        (r["source_a"], r["source_b"]): r
        for r in QS["source_vocab_overlap"](spark, SF_SMALL).collect()
    }
    srcs = sorted(vocab)
    expect_pairs = {
        (a, b)
        for i, a in enumerate(srcs)
        for b in srcs[i + 1 :]
        if vocab[a] & vocab[b]
    }
    assert set(got) == expect_pairs
    for (a, b), r in got.items():
        i = len(vocab[a] & vocab[b])
        assert (r["terms_a"], r["terms_b"], r["n_shared"]) == (
            len(vocab[a]), len(vocab[b]), i,
        )
        assert math.isclose(
            r["vocab_jaccard"], round(i / len(vocab[a] | vocab[b]), 4), abs_tol=1e-9
        )


def test_session_gap_sweep_matches_python(spark):
    from etl_jlp_spark.operators.sessionize import GAP_SWEEP_S

    ev = load_table(spark, SF_SMALL, "events").select("event_id", "user_id", "ts").collect()
    by_user = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    gaps = []
    for u, rows in by_user.items():
        rows.sort()
        for (t0, _), (t1, _) in zip(rows, rows[1:]):
            gaps.append((t1 - t0).total_seconds() * 1e6)
    got = {r["gap_s"]: r for r in QS["session_gap_sweep"](spark, SF_SMALL).collect()}
    assert set(got) == set(GAP_SWEEP_S)
    n_events, n_users = len(ev), len(by_user)
    for t in GAP_SWEEP_S:
        breaks = sum(1 for g in gaps if g > t * 1e6)
        g = got[t]
        assert (g["n_sessions"], g["n_gap_breaks"]) == (breaks + n_users, breaks)
        assert math.isclose(
            g["avg_events_per_session"], round(n_events / (breaks + n_users), 4), abs_tol=1e-9
        )
    # monotone: larger cutoff → fewer sessions
    ns = [got[t]["n_sessions"] for t in sorted(GAP_SWEEP_S)]
    assert ns == sorted(ns, reverse=True)


def test_cross_source_neardup_matrix_matches_pairs(spark):
    src = {r["doc_id"]: r["source"] for r in _docs(spark)}
    pairs = QS["dedup_minhash_lsh"](spark, SF_SMALL).collect()
    cells = Counter()
    for r in pairs:
        a, b = src[r["doc_a"]], src[r["doc_b"]]
        cells[(min(a, b), max(a, b))] += 1
    got = {
        (r["source_x"], r["source_y"]): r
        for r in QS["cross_source_neardup_matrix"](spark, SF_SMALL).collect()
    }
    assert {k: r["n_pairs"] for k, r in got.items()} == dict(cells)
    total = sum(cells.values())
    for k, r in got.items():
        assert math.isclose(r["pair_share"], round(cells[k] / total, 4), abs_tol=1e-9)


def test_event_count_dispersion_matches_numpy(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "user_id").collect()
    cnt = Counter((r["event_type"], r["user_id"]) for r in ev)
    by_type = defaultdict(list)
    for (t, _), c in cnt.items():
        by_type[t].append(c)
    got = {r["event_type"]: r for r in QS["event_count_dispersion"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_type)
    for t, counts in by_type.items():
        a = np.array(counts, dtype=float)
        mean, var = a.mean(), a.var(ddof=1)
        g = got[t]
        assert g["n_users"] == len(counts)
        assert math.isclose(g["mean_count"], round(mean, 4), abs_tol=2e-4)
        assert math.isclose(g["var_count"], round(var, 4), abs_tol=2e-4)
        assert math.isclose(g["dispersion_index"], round(var / mean, 4), abs_tol=2e-4)
        if var > mean:
            assert math.isclose(g["nb_r_moment"], round(mean * mean / (var - mean), 4), abs_tol=2e-3)
        else:
            assert g["nb_r_moment"] is None


def test_hll_rolling_7d_matches_python(spark):
    from datetime import timedelta

    from etl_jlp_spark.operators.sketches import (
        HLL_M,
        HLL_ROLL_DAYS,
        _HLL_ALPHA,
        _HLL_REST_BITS,
    )

    ev = (
        load_table(spark, SF_SMALL, "events")
        .select(F.col("ts").cast("date").alias("day"), "event_id")
        .collect()
    )
    day_reg = defaultdict(dict)
    day_ids = defaultdict(set)
    for r in ev:
        h = int(hashlib.md5(str(r["event_id"]).encode()).hexdigest()[:15], 16)
        b, rest = h % HLL_M, h // HLL_M
        rho = (_HLL_REST_BITS + 1) if rest == 0 else (_HLL_REST_BITS + 1 - rest.bit_length())
        day_reg[r["day"]][b] = max(day_reg[r["day"]].get(b, 0), rho)
        day_ids[r["day"]].add(r["event_id"])
    got = {r["day"]: r for r in QS["hll_rolling_7d"](spark, SF_SMALL).collect()}
    assert set(got) == set(day_reg)
    for day in day_reg:
        reg = {}
        ids = set()
        for back in range(HLL_ROLL_DAYS):
            d = day - timedelta(days=back)
            for b, m in day_reg.get(d, {}).items():
                reg[b] = max(reg.get(b, 0), m)
            ids |= day_ids.get(d, set())
        z = sum(2.0 ** -m for m in reg.values())
        v = HLL_M - len(reg)
        raw = _HLL_ALPHA * HLL_M * HLL_M / (z + v)
        est = HLL_M * math.log(HLL_M / v) if (raw <= 2.5 * HLL_M and v > 0) else raw
        g = got[day]
        assert math.isclose(g["est_rolling_distinct"], round(est, 4), abs_tol=1e-9), day
        assert g["exact_rolling_distinct"] == len(ids)


def test_holt_winters_matches_python(spark):
    from etl_jlp_spark.plans.timeseries import HW_ALPHA, HW_BETA, HW_GAMMA, HW_M

    ev = load_table(spark, SF_SMALL, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    ).collect()
    daily = defaultdict(float)
    for r in ev:
        daily[r["day"]] += r["value"]
    ys = [round(daily[d], 2) for d in sorted(daily)]
    assert len(ys) > HW_M
    l = sum(ys[:HW_M]) / 7.0
    b = 0.0
    s = [y - l for y in ys[:HW_M]]
    sae = sse = 0.0
    n = 0
    for y in ys[HW_M:]:
        seas = s[0]
        err = y - ((l + b) + seas)
        lnew = HW_ALPHA * (y - seas) + (1 - HW_ALPHA) * (l + b)
        bnew = HW_BETA * (lnew - l) + (1 - HW_BETA) * b
        snew = HW_GAMMA * (y - lnew) + (1 - HW_GAMMA) * seas
        s = s[1:] + [snew]
        l, b = lnew, bnew
        sae += abs(err)
        sse += err * err
        n += 1
    g = QS["holt_winters_eval"](spark, SF_SMALL).collect()[0]
    assert (g["n_days"], g["n_eval"]) == (len(ys), n)
    assert math.isclose(g["mae_hw"], round(sae / n, 4), abs_tol=1e-6)
    assert math.isclose(g["rmse_hw"], round(math.sqrt(sse / n), 4), abs_tol=1e-6)
    assert math.isclose(g["level"], round(l, 4), abs_tol=1e-6)
    assert math.isclose(g["trend"], round(b, 4), abs_tol=1e-6)
    assert math.isclose(g["forecast_next"], round((l + b) + s[0], 4), abs_tol=1e-6)


def test_embedding_fisher_matches_numpy(spark):
    emb = load_table(spark, SF_SMALL, "embeddings").select("label", "embedding").collect()
    by_label = defaultdict(list)
    for r in emb:
        by_label[r["label"]].append(
            np.array([round(float(x) * 1e6) for x in r["embedding"]]) / 1e6
        )
    all_vecs = np.vstack([v for vs in by_label.values() for v in vs])
    gmean = all_vecs.mean(axis=0)
    got = {r["label"]: r for r in QS["embedding_fisher_separation"](spark, SF_SMALL).collect()}
    assert set(got) == set(by_label)
    for lab, vs in by_label.items():
        m = np.vstack(vs)
        within = m.var(axis=0, ddof=0).sum()
        between = ((m.mean(axis=0) - gmean) ** 2).sum()
        g = got[lab]
        assert g["n_vectors"] == len(vs)
        assert math.isclose(g["within_trace"], within, rel_tol=1e-4, abs_tol=1e-5)
        assert math.isclose(g["between_trace"], between, rel_tol=1e-4, abs_tol=1e-5)
        if within > 0:
            assert math.isclose(g["fisher_ratio"], between / within, rel_tol=1e-3, abs_tol=1e-3)


def test_hour_profile_and_order_width_match_python(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "ts", "value").collect()
    cells = defaultdict(lambda: [0, 0.0])
    per_type = Counter()
    for r in ev:
        c = cells[(r["event_type"], r["ts"].hour)]
        c[0] += 1
        c[1] += r["value"]
        per_type[r["event_type"]] += 1
    got = {
        (r["event_type"], r["hour"]): r
        for r in QS["hour_of_day_profile"](spark, SF_SMALL).collect()
    }
    assert set(got) == set(cells)
    for k, (n, sv) in cells.items():
        g = got[k]
        assert g["n_events"] == n
        assert math.isclose(g["sum_value"], round(sv, 2), abs_tol=2e-2)
        assert math.isclose(g["hour_share"], round(n / per_type[k[0]], 4), abs_tol=1e-9)

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).collect()
    per_order = defaultdict(lambda: [0, 0.0])
    for r in li:
        po = per_order[r["l_orderkey"]]
        po[0] += 1
        po[1] += r["l_extendedprice"] * (1 - r["l_discount"])
    hist = defaultdict(lambda: [0, 0])
    for n_lines, rev in per_order.values():
        hist[n_lines][0] += 1
        hist[n_lines][1] += round(rev)
    got2 = {r["n_lines"]: r for r in QS["order_lines_histogram"](spark, SF_SMALL).collect()}
    assert set(got2) == set(hist)
    n_tot = sum(v[0] for v in hist.values())
    r_tot = sum(v[1] for v in hist.values())
    for k, (no, rev) in hist.items():
        g = got2[k]
        assert (g["n_orders"], g["total_revenue"]) == (no, rev)
        assert math.isclose(g["order_share"], round(no / n_tot, 4), abs_tol=1e-9)
        assert math.isclose(g["revenue_share"], round(rev / r_tot, 4), abs_tol=1e-9)


def test_new_vs_returning_matches_python(spark):
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "ts").collect()
    user_days = {(r["user_id"], r["ts"].date()) for r in ev}
    firsts = {}
    for u, d in user_days:
        firsts[u] = min(firsts.get(u, d), d)
    per_day = defaultdict(lambda: [0, 0])
    for u, d in user_days:
        per_day[d][0 if d == firsts[u] else 1] += 1
    got = {r["day"]: r for r in QS["new_vs_returning_daily"](spark, SF_SMALL).collect()}
    assert set(got) == set(per_day)
    for d, (new, ret) in per_day.items():
        g = got[d]
        assert (g["new_users"], g["returning_users"]) == (new, ret)
        assert math.isclose(g["returning_share"], round(ret / (new + ret), 4), abs_tol=1e-9)


def test_topk_movers_wow_matches_python(spark):
    from datetime import timedelta

    from etl_jlp_spark.plans.ops_metrics import WOW_TOP_K

    ev = load_table(spark, SF_SMALL, "events").select("user_id", "ts", "value").collect()
    weekly = defaultdict(float)
    for r in ev:
        d = r["ts"].date()
        week = d - timedelta(days=d.weekday())
        weekly[(r["user_id"], week)] += r["value"]
    cents = {k: round(v * 100) for k, v in weekly.items()}
    deltas = []
    for (u, w), c in cents.items():
        prev = cents.get((u, w - timedelta(days=7)))
        # consecutive weeks only: mirror the prev_week == week - 7 gate,
        # which in the op uses lag() (the user's PREVIOUS ACTIVE week)
        by_user = sorted(wk for (uu, wk) in cents if uu == u)
        i = by_user.index(w)
        if i == 0 or by_user[i - 1] != w - timedelta(days=7):
            continue
        deltas.append((abs(c - prev), u, w, c, prev))
    deltas.sort(key=lambda x: (-x[0], x[1], x[2]))
    got = QS["topk_movers_wow"](spark, SF_SMALL).orderBy("rk").collect()
    assert len(got) == min(WOW_TOP_K, len(deltas))
    for g, (_, u, w, c, prev) in zip(got, deltas[:WOW_TOP_K]):
        assert (g["user_id"], g["week"]) == (u, w)
        assert math.isclose(g["delta"], round((c - prev) / 100.0, 2), abs_tol=1e-9)
