"""Semantic invariants for the round-10 operators: matryoshka
truncation eval, enrichment null-pattern phi, topic coherence, and the
compaction packing plan. Value-level correctness is pinned by the
DuckDB oracles (tools/parity.py); these tests pin the properties the
oracles cannot express — cross-row algebra, brute-force agreement on
tiny frames, and packing feasibility."""

import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def test_matryoshka_recall_bounds_and_dims(spark):
    from etl_jlp_spark.operators.embeddings import MRL_DIMS, MRL_TOP_K

    rows = {r["trunc_dim"]: r for r in QS["matryoshka_truncation_eval"](spark, SF_SMALL).collect()}
    assert set(rows) == set(MRL_DIMS)
    for r in rows.values():
        assert 0.0 <= r["avg_recall_at_k"] <= 1.0
        assert 0.0 <= r["top1_rate"] <= 1.0
        assert r["n_queries"] >= 1
        # a query whose top-1 agrees contributes ≥1 hit of k to recall
        assert r["avg_recall_at_k"] >= r["top1_rate"] / MRL_TOP_K - 1e-9


def test_matryoshka_full_dim_self_recall_is_one(spark):
    """Sanity of the harness itself: scoring the FULL dim against full
    retrieval must give recall 1 — run the same plan with a trunc dim
    equal to the embedding dim via monkeypatched dims."""
    import etl_jlp_spark.operators.embeddings as embmod

    emb = embmod.load_table(spark, SF_SMALL, "embeddings")
    dim = embmod._emb_dim(emb)
    orig = embmod.MRL_DIMS
    embmod.MRL_DIMS = (dim,)
    try:
        row = embmod.matryoshka_truncation_eval(spark, SF_SMALL).collect()[0]
    finally:
        embmod.MRL_DIMS = orig
    assert row["trunc_dim"] == dim
    assert row["avg_recall_at_k"] == 1.0
    assert row["top1_rate"] == 1.0


def test_null_pattern_counts_and_phi_range(spark):
    rows = QS["enrichment_null_pattern"](spark, SF_SMALL).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0 <= r["both_null"] <= min(r["null_a"], r["null_b"])
        assert max(r["null_a"], r["null_b"]) <= r["n"]
        if r["phi"] is not None:
            assert -1.0 - 1e-9 <= r["phi"] <= 1.0 + 1e-9
        if r["jaccard_null"] is not None:
            assert 0.0 <= r["jaccard_null"] <= 1.0
    # purchase recency is missing whenever ALL event activity is missing:
    # the (last_event_ts, last_purchase_ts) pair must co-occur strongly
    pair = {(r["col_a"], r["col_b"]): r for r in rows}
    ab = pair[("last_event_ts", "last_purchase_ts")]
    assert ab["both_null"] == ab["null_a"]  # event-null ⊆ purchase-null
    assert ab["phi"] is None or ab["phi"] > 0.5


def test_null_pattern_phi_matches_bruteforce(spark):
    """phi on a hand-built 2×2: n=10, na=4, nb=5, both=3."""
    from etl_jlp_spark.operators.profiling import enrichment_null_pattern  # noqa: F401

    n, na, nb, both = 10, 4, 5, 3
    want = (n * both - na * nb) / math.sqrt(na * (n - na) * nb * (n - nb))
    got = (
        spark.createDataFrame([(n, na, nb, both)], "n long, null_a long, null_b long, both_null long")
        .select(
            F.round(
                (F.col("n").cast("double") * F.col("both_null")
                 - F.col("null_a").cast("double") * F.col("null_b"))
                / F.sqrt(
                    F.col("null_a").cast("double")
                    * (F.col("n") - F.col("null_a"))
                    * F.col("null_b")
                    * (F.col("n") - F.col("null_b"))
                ),
                6,
            ).alias("phi")
        )
        .first()["phi"]
    )
    assert abs(got - round(want, 6)) < 1e-12


def test_topic_coherence_shape(spark):
    from etl_jlp_spark.operators.corpus_stats import COHERENCE_TOP_M

    rows = QS["topic_coherence_report"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_terms"] <= COHERENCE_TOP_M
        assert len(r["top_terms"].split(",")) == r["n_terms"]
        # UMass scores are ln((c_ab+1)/df_a) with c_ab ≤ df_a, so each
        # pair is ≤ ln(1 + 1/df_a) ≤ ln 2; the average is bounded too
        assert r["coherence"] <= math.log(2.0) + 1e-9


def test_compaction_plan_packs_everything_once(spark):
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.layout import TARGET_FILE_BYTES

    plan = QS["compaction_packing_plan"](spark, SF_SMALL).collect()
    inv_bytes = (
        load_table(spark, SF_SMALL, "events")
        .agg(
            F.sum(
                F.lit(32) + F.length("event_type") + F.length(F.coalesce("props", F.lit("")))
            ).cast("long")
        )
        .first()[0]
    )
    # conservation: every inventory byte lands in exactly one bin
    assert sum(r["total_bytes"] for r in plan) == inv_bytes
    # bin ids are unique and start at 0; they need NOT be contiguous —
    # an entry larger than the target occupies a multi-target cum span,
    # skipping the intermediate ids (documented oversized-entry behavior)
    ids = sorted(r["bin_id"] for r in plan)
    assert len(set(ids)) == len(ids)
    assert ids[0] == 0
    for r in plan:
        assert r["n_files"] >= 1
        assert r["min_file_bytes"] <= r["max_file_bytes"] <= r["total_bytes"]
        # cumulative-volume packing: a bin only exceeds the target by
        # less than its own last file (no bin is gratuitously overfull)
        assert r["total_bytes"] < TARGET_FILE_BYTES + r["max_file_bytes"]


def test_salting_plan_integer_algebra(spark):
    rows = QS["skew_salting_plan"](spark, SF_SMALL).collect()
    assert rows
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-2
    for r in rows:
        assert r["salt_factor"] >= 1
        assert r["needs_salt"] == (r["salt_factor"] > 1)
        # rows_per_salt is the exact ceiling of n / salt_factor
        assert r["rows_per_salt"] == -(-r["n"] // r["salt_factor"])
        # salting may not over-split: factor-1 sub-keys would overflow
        assert (r["salt_factor"] - 1) * r["rows_per_salt"] < r["n"] + r["salt_factor"]


def test_ngram_novelty_bounds_and_doc_count(spark):
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.sampling import split_expr

    rows = QS["ngram_novelty_report"](spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["min_novelty"] <= r["avg_novelty"] <= 1.0
        assert 0 <= r["n_memorized"] <= r["n_test_docs"]
    # every test-split doc with >= 3 whitespace tokens is scored, none twice
    docs = load_table(spark, SF_SMALL, "documents")
    want = (
        docs.withColumn("split", split_expr(F.col("doc_id")))
        .where(F.col("split") == "test")
        .where(F.size(F.split(F.trim(F.lower("text")), r"\s+")) >= 3)
        .count()
    )
    assert sum(r["n_test_docs"] for r in rows) == want


def test_isotonic_calibration_is_monotone_and_mean_preserving(spark):
    rows = sorted(QS["isotonic_calibration"](spark, SF_SMALL).collect(), key=lambda r: r["bin"])
    assert rows
    iso = [r["iso_rate"] for r in rows]
    assert all(0.0 <= v <= 1.0 for v in iso)
    assert iso == sorted(iso)  # PAV output is non-decreasing by construction
    # PAV preserves the count-weighted mean (within per-bin rounding)
    n = sum(r["n_docs"] for r in rows)
    raw_mean = sum(r["raw_rate"] * r["n_docs"] for r in rows) / n
    iso_mean = sum(r["iso_rate"] * r["n_docs"] for r in rows) / n
    assert abs(raw_mean - iso_mean) < 1e-3
    # where the raw rates are already monotone, PAV must not move them
    raw = [r["raw_rate"] for r in rows]
    if raw == sorted(raw):
        assert all(abs(a - b) < 2e-4 for a, b in zip(raw, iso))


def test_sprt_decisions_match_boundaries(spark):
    import math as m

    rows = QS["sprt_ab_monitor"](spark, SF_SMALL).collect()
    assert rows
    bound = m.log(19.0)
    per_arm = {}
    for r in sorted(rows, key=lambda r: (r["arm"], r["day"])):
        assert 0 <= r["conv"] <= r["n"]
        want = (
            "reject_h0"
            if r["llr"] >= bound - 1e-6
            else "accept_h0"
            if r["llr"] <= -bound + 1e-6
            else "continue"
        )
        # rounded llr vs unrounded decision can only disagree inside
        # a 1e-6 band of the boundary
        if abs(abs(r["llr"]) - bound) > 1e-5:
            assert r["decision"] == want, (r["arm"], r["day"])
        prev = per_arm.get(r["arm"])
        if prev is not None:
            assert r["cum_n"] > prev["cum_n"]  # strictly accumulating
        per_arm[r["arm"]] = r
    # the control arm is tested against its own full-period rate: H0 is
    # true by construction, so it must never cross the reject boundary
    assert all(r["decision"] != "reject_h0" for r in rows if r["arm"] == "A")


def test_matryoshka_zero_prefix_and_narrow_dim_guards(spark, tmp_path):
    """A vector whose first-8 prefix is all zero must not crash or
    diverge (NULL cosine, ranked last — the engine-symmetric choice);
    an embedding table narrower than max(MRL_DIMS) must fail fast."""
    import pytest

    from etl_jlp_spark.operators.embeddings import matryoshka_truncation_eval

    dim = 33
    rows = []
    for i in range(12):
        vec = [0.0] * 8 + [float(i + j + 1) for j in range(dim - 8)] if i == 0 else [
            float((i * 7 + j) % 5 + 1) for j in range(dim)
        ]
        rows.append((i, vec, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sf = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{sf}/embeddings.parquet")
    out = matryoshka_truncation_eval(spark, sf).collect()
    assert out  # vec_id 0 (the zero-prefix vector) is the query sample
    for r in out:
        assert 0.0 <= r["avg_recall_at_k"] <= 1.0

    narrow = spark.createDataFrame(
        [(0, [1.0] * 16, 0)], "vec_id long, embedding array<float>, label int"
    )
    sf2 = str(tmp_path / "sf2")
    narrow.coalesce(1).write.parquet(f"{sf2}/embeddings.parquet")
    with pytest.raises(ValueError, match="matryoshka"):
        matryoshka_truncation_eval(spark, sf2)
