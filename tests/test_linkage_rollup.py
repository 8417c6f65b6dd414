"""Round-5 additions: fuzzy edit-distance join, incremental rollup
maintenance, quantized ANN. Value parity with DuckDB is covered by
test_parity.py; these tests pin the SHAPE claims — prefix-filter
candidate pruning vs brute force, store reuse + delta-only pushdown,
and codegen-friendly join plans."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

import __spark_entry__ as ent

QS = ent.queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- fuzzy_join_editdist ---------------------------------------------------


def test_fuzzy_join_matches_brute_force(spark):
    from etl_jlp_spark.operators.linkage import FUZZY_K, FUZZY_MIN_LEN, FUZZY_PFX_LEN

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", F.substring("text", 1, FUZZY_PFX_LEN).alias("pfx")
    ).filter(F.length("pfx") >= FUZZY_MIN_LEN)
    a = docs.withColumnsRenamed({"doc_id": "doc_a", "pfx": "pfx_a"})
    b = docs.withColumnsRenamed({"doc_id": "doc_b", "pfx": "pfx_b"})
    brute = (
        a.crossJoin(b)
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.levenshtein("pfx_a", "pfx_b") <= FUZZY_K)
        )
        .select(
            "doc_a", "doc_b", F.levenshtein("pfx_a", "pfx_b").cast("bigint").alias("dist")
        )
    )
    expected = {tuple(r) for r in brute.collect()}
    got = {tuple(r) for r in QS["fuzzy_join_editdist"](spark, SF_SMALL).collect()}
    # prefix filtering must be COMPLETE (every true pair survives) and
    # the verify step exact (no false positives)
    assert got == expected
    assert expected  # the corpus contains near-dup replicas — non-vacuous


def test_fuzzy_join_never_plans_a_cross_product(spark):
    plan = _plan(QS["fuzzy_join_editdist"](spark, SF_SMALL))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_fuzzy_join_keys_are_data_independent_and_rare(spark):
    """The probe expansion is bounded by a CONSTANT — (2K+1) lengths ×
    (K+1) segments × (2K+1) shifts — independent of corpus size, and
    index segment values must stay rare (the property that keeps the
    candidate join linear; the q-gram scheme this replaced failed it)."""
    from etl_jlp_spark.operators.linkage import (
        FUZZY_K,
        FUZZY_SEGS,
        _INDEX_SEGS,
        _keys,
        _probe_segments,
    )

    keys = _keys(spark, SF_SMALL)
    probe_per_doc = _probe_segments(keys, "doc_a").groupBy("doc_a").count()
    bound = (2 * FUZZY_K + 1) * FUZZY_SEGS * (2 * FUZZY_K + 1)
    assert probe_per_doc.agg(F.max("count")).collect()[0][0] <= bound
    idx = keys.select(F.explode(F.expr(_INDEX_SEGS)).alias("s")).select("s.seg_id", "s.lb", "s.seg")
    max_df = idx.groupBy("seg_id", "lb", "seg").count().agg(F.max("count")).collect()[0][0]
    assert max_df <= 32  # segment values are rare even on the tiny-vocab corpus


# --- rollup_incremental ----------------------------------------------------


def test_rollup_store_is_built_once_and_reused(spark):
    from etl_jlp_spark.operators.rollup import ensure_rollup_store

    path1, cutoff1 = ensure_rollup_store(spark, SF_SMALL)
    marker = os.path.join(path1, "agg", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    path2, cutoff2 = ensure_rollup_store(spark, SF_SMALL)
    assert (path1, cutoff1) == (path2, cutoff2)
    assert os.path.getmtime(marker) == mtime  # no rebuild on the second call


def test_rollup_delta_scan_is_filter_pushed(spark):
    """After the store exists, the refresh plan filters the raw int64
    ts at the parquet scan (row-group skipping at 100 TB) — the full
    history is only ever read from the rollup-sized store."""
    from etl_jlp_spark.operators.rollup import ensure_rollup_store

    ensure_rollup_store(spark, SF_SMALL)
    plan = _plan(QS["rollup_incremental"](spark, SF_SMALL))
    assert "GreaterThanOrEqual(ts," in plan


def test_rollup_matches_scratch_recompute(spark):
    from etl_jlp_spark.catalog import load_table

    got = QS["rollup_incremental"](spark, SF_SMALL)
    events = load_table(spark, SF_SMALL, "events")
    scratch = (
        events.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in scratch.collect()}


def test_rollup_day_partitioned_layout(spark):
    """The store's day partitioning is what makes an upsert refresh a
    directory-pruned rewrite."""
    from etl_jlp_spark.operators.rollup import ensure_rollup_store

    path, _ = ensure_rollup_store(spark, SF_SMALL)
    days = [d for d in os.listdir(os.path.join(path, "agg")) if d.startswith("day=")]
    assert len(days) > 1


# --- ann_quantized_topk ----------------------------------------------------


def test_quantized_ann_codegen_join(spark):
    plan = _plan(QS["ann_quantized_topk"](spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_quantized_ann_rank_agreement_with_float_baseline(spark):
    """int8 quantization must preserve most of the top-k ranking — the
    measurable recall contract of the serving path."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in QS["ann_topk_cosine"](spark, SF_SMALL).collect()
    }
    quant = {
        (r["query_id"], r["neighbor_id"])
        for r in QS["ann_quantized_topk"](spark, SF_SMALL).collect()
    }
    assert exact and len(quant) == len(exact)
    overlap = len(exact & quant) / len(exact)
    assert overlap >= 0.9


def test_fuzzy_prebuilt_store_reused_and_matches_split_brute_force(spark):
    import os

    from etl_jlp_spark.operators.linkage import (
        FUZZY_BATCH_HEX,
        FUZZY_K,
        _keys,
        ensure_fuzzy_store,
    )

    segs_path, _ = ensure_fuzzy_store(spark, SF_SMALL)
    marker = os.path.join(segs_path, "_SUCCESS")
    mtime = os.path.getmtime(marker)
    ensure_fuzzy_store(spark, SF_SMALL)
    assert os.path.getmtime(marker) == mtime  # no rebuild

    keys = _keys(spark, SF_SMALL)
    is_new = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < FUZZY_BATCH_HEX
    n = keys.filter(is_new).withColumnsRenamed({"doc_id": "doc_new", "pfx": "pfx_n"})
    o = keys.filter(~is_new).withColumnsRenamed({"doc_id": "doc_old", "pfx": "pfx_o"})
    brute = (
        n.crossJoin(o)
        .filter(F.levenshtein("pfx_n", "pfx_o") <= FUZZY_K)
        .select("doc_new", "doc_old", F.levenshtein("pfx_n", "pfx_o").cast("bigint").alias("dist"))
    )
    expected = {tuple(r) for r in brute.collect()}
    got = {tuple(r) for r in QS["fuzzy_join_prebuilt"](spark, SF_SMALL).collect()}
    assert got == expected
