"""Pure-Python replicas for the parameter-sweep reports: the MinHash
band-configuration curve and the cosine-threshold dedup curve."""

import hashlib
import math
from collections import defaultdict

from tests.conftest import SF_SMALL
from etl_jlp_spark.catalog import load_table

import __spark_entry__ as ent

QS = ent.queries()


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_minhash_band_sweep_matches_python(spark):
    from etl_jlp_spark.operators.similarity import (
        MINHASH_K,
        MINHASH_RECALL_SAMPLE_HEX,
        MINHASH_SWEEP_CONFIGS,
        MINHASH_TAU,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()
    shingles = {}
    for r in docs:
        toks = [t for t in r["text"].lower().strip(" ").split() if t]
        if len(toks) >= 3:
            shingles[r["doc_id"]] = {
                " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
            }
    samp = sorted(
        d for d in shingles if _md5(str(d))[:1] < MINHASH_RECALL_SAMPLE_HEX
    )
    sigs = {
        d: [min(_md5(f"{i}:{sh}") for sh in shingles[d]) for i in range(MINHASH_K)]
        for d in samp
    }
    truth = set()
    for i, a in enumerate(samp):
        for b in samp[i + 1 :]:
            inter = len(shingles[a] & shingles[b])
            if inter and round(
                inter / (len(shingles[a]) + len(shingles[b]) - inter), 4
            ) >= MINHASH_TAU:
                truth.add((a, b))
    expect = {}
    for bands, rr in MINHASH_SWEEP_CONFIGS:
        buckets = defaultdict(list)
        for d, s in sigs.items():
            for b in range(bands):
                buckets[(b, _md5("".join(s[b * rr : (b + 1) * rr])))].append(d)
        cand = set()
        for ds in buckets.values():
            ds = sorted(ds)
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    cand.add((a, b))
        hit = len(cand & truth)
        expect[bands] = (len(cand), len(truth), hit)
    got = {r["bands"]: r for r in QS["minhash_band_sweep"](spark, SF_SMALL).collect()}
    assert set(got) == set(expect)
    for bands, (nc, nt, nh) in expect.items():
        g = got[bands]
        assert (g["n_candidate_pairs"], g["n_true_pairs"], g["n_hit"]) == (nc, nt, nh), bands
        if nt:
            assert math.isclose(g["recall"], round(nh / nt, 4), abs_tol=1e-9)
    # more bands can only widen the candidate set (same signature)
    counts = [got[b]["n_candidate_pairs"] for b, _ in MINHASH_SWEEP_CONFIGS]
    assert counts == sorted(counts)


def test_cosine_threshold_sweep_matches_python(spark):
    from etl_jlp_spark.operators.similarity import (
        COSINE_SWEEP_TAUS,
        SIGN_BANDS,
        SIGN_BUCKET_BITS,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}

    def bucket(v, band):
        acc = 0
        for j in range(band * SIGN_BUCKET_BITS, (band + 1) * SIGN_BUCKET_BITS):
            acc = acc * 2 + (1 if v[j] >= 0 else 0)
        return acc

    buckets = defaultdict(list)
    for vid, v in vecs.items():
        for b in range(SIGN_BANDS):
            buckets[(b, bucket(v, b))].append(vid)
    cand = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cand.add((a, b))

    def seqdot(x, y):
        acc = 0.0
        for xi, yi in zip(x, y):
            acc += xi * yi  # sequential order — matches static_dot
        return acc

    scored = {}
    floor = min(COSINE_SWEEP_TAUS)
    for a, b in cand:
        va, vb = vecs[a], vecs[b]
        c = round(seqdot(va, vb) / (math.sqrt(seqdot(va, va)) * math.sqrt(seqdot(vb, vb))), 4)
        if c >= floor:
            scored[(a, b)] = c
    best = defaultdict(float)
    for (a, b), c in scored.items():
        best[a] = max(best[a], c)
        best[b] = max(best[b], c)
    got = {r["tau"]: r for r in QS["cosine_threshold_sweep"](spark, SF_SMALL).collect()}
    assert set(got) == set(COSINE_SWEEP_TAUS)
    for t in COSINE_SWEEP_TAUS:
        np_ = sum(1 for c in scored.values() if c >= t)
        nv = sum(1 for c in best.values() if c >= t)
        g = got[t]
        assert (g["n_pairs"], g["n_vectors_dup"]) == (np_, nv), t
        assert math.isclose(g["dup_share"], round(nv / len(vecs), 4), abs_tol=1e-9)
