"""Focused pins for the round-10 optimization rewrites: each changed
operator internal must stay EQUIVALENT to the shape it replaced —
the optimizations are plan/driver-latency changes, never value changes.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _norm_plan(df) -> str:
    return re.sub(r"#\d+", "#", df._jdf.queryExecution().analyzed().toString())


def test_static_dot_expr_tree_matches_column_api(spark):
    """static_dot (parsed-SQL form) must build the IDENTICAL analyzed
    expression tree as the old per-term Column-API loop — same left-deep
    add chain, same index order — so every dot product stays bit-for-bit
    what it was before the rewrite."""
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.functions.vectors import as_double_array, static_dot

    emb = load_table(spark, SF_SMALL, "embeddings")
    dim = len(emb.select("embedding").head()[0])

    def static_dot_old(a, b, d):
        terms = [a.getItem(i) * b.getItem(i) for i in range(d)]
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    cases = [
        (F.col("v"), F.col("v"), emb.select("vec_id", as_double_array(F.col("embedding")).alias("v"))),
        (as_double_array(F.col("embedding")), as_double_array(F.col("embedding")), emb),
    ]
    for a, b, src in cases:
        new = _norm_plan(src.select(static_dot(a, b, dim).alias("x")))
        old = _norm_plan(src.select(static_dot_old(a, b, dim).alias("x")))
        assert new == old


def test_word_shingles_set_equals_global_distinct(spark):
    """_word_shingles' per-doc array_distinct must yield exactly the
    set the old explode-then-global-.distinct() produced (shingles only
    ever collide within a doc, so per-doc dedup is sufficient)."""
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.similarity import _word_shingles

    docs = load_table(spark, SF_SMALL, "documents")
    n = 3
    arr = F.split(F.trim(F.lower("text")), r"\s+")
    old = (
        docs.select("doc_id", arr.alias("arr"))
        .filter(F.size("arr") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(arr) - {n}), j -> concat_ws(' ', slice(arr, j + 1, {n})))"
                )
            ).alias("sh"),
        )
        .distinct()
    )
    new = _word_shingles(docs, n)
    assert new.count() == old.count()  # per-doc dedup caught every dup
    assert new.exceptAll(old).isEmpty() and old.exceptAll(new).isEmpty()


def test_probe_segments_match_higher_order_form(spark):
    """The exploded-static-grid PassJoin probe generator must produce
    exactly the (id, seg_id, lb, seg) set of the old nested
    transform/filter/flatten/array_distinct higher-order expression."""
    from etl_jlp_spark.operators.linkage import (
        FUZZY_K,
        FUZZY_MIN_LEN,
        FUZZY_SEGS,
        _keys,
        _probe_segments,
    )

    old_expr = f"""
array_distinct(flatten(transform(
  sequence(greatest({FUZZY_MIN_LEN}, length(pfx) - {FUZZY_K}), length(pfx) + {FUZZY_K}),
  lb -> flatten(transform(sequence(0, {FUZZY_SEGS - 1}), i ->
    transform(
      filter(sequence(-{FUZZY_K}, {FUZZY_K}), d ->
        1 + i * (lb div {FUZZY_SEGS}) + least(i, lb % {FUZZY_SEGS}) + d >= 1
        AND i * (lb div {FUZZY_SEGS}) + least(i, lb % {FUZZY_SEGS}) + d
            + (lb div {FUZZY_SEGS}) + if(i < lb % {FUZZY_SEGS}, 1, 0) <= length(pfx)),
      d -> named_struct(
        'seg_id', i,
        'lb', lb,
        'seg', substring(pfx,
                  1 + i * (lb div {FUZZY_SEGS}) + least(i, lb % {FUZZY_SEGS}) + d,
                  (lb div {FUZZY_SEGS}) + if(i < lb % {FUZZY_SEGS}, 1, 0)))))))))
"""
    keys = _keys(spark, SF_SMALL)
    old = (
        keys.select(F.col("doc_id").alias("doc_a"), F.explode(F.expr(old_expr)).alias("s"))
        .select("doc_a", "s.seg_id", "s.lb", "s.seg")
    )
    new = _probe_segments(keys, "doc_a")
    assert new.exceptAll(old).isEmpty() and old.exceptAll(new).isEmpty()


def test_filter_cascade_counts_match_sequential_semi_joins(spark):
    """The one-job flag-aggregation funnel must report exactly the
    counts the old sequential semi-join/count chain produced."""
    from etl_jlp_spark.catalog import load_table
    from etl_jlp_spark.operators.dedup import dedup_exact_docs
    from etl_jlp_spark.operators.quality_rules import (
        gopher_quality_filter,
        text_repetition,
    )
    from etl_jlp_spark.operators.similarity import dedup_minhash_lsh
    from etl_jlp_spark.operators.textstats import text_langid
    from etl_jlp_spark.plans.curate import (
        CASCADE_MAX_BIGRAM,
        CASCADE_MIN_DISTINCT,
        filter_cascade_report,
    )

    got = {
        (r["stage"]): (r["n_in"], r["n_kept"])
        for r in filter_cascade_report(spark, SF_SMALL).collect()
    }
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id")
    keeps = [
        ("langid", text_langid(spark, SF_SMALL).filter(F.col("lang_pred") != "unknown").select("doc_id")),
        ("gopher", gopher_quality_filter(spark, SF_SMALL).filter("keep").select("doc_id")),
        (
            "repetition",
            text_repetition(spark, SF_SMALL)
            .filter(
                (F.col("distinct_ratio") >= CASCADE_MIN_DISTINCT)
                & (F.col("top_bigram_frac") <= CASCADE_MAX_BIGRAM)
            )
            .select("doc_id"),
        ),
        ("exact_dedup", dedup_exact_docs(spark, SF_SMALL).select(F.col("keep_doc_id").alias("doc_id"))),
    ]
    surv = docs
    n_in = docs.count()
    for name, keep in keeps:
        surv = surv.join(keep, "doc_id", "left_semi").localCheckpoint(eager=True)
        n_kept = surv.count()
        assert got[name] == (n_in, n_kept), name
        n_in = n_kept
    drop_b = dedup_minhash_lsh(spark, SF_SMALL).select(F.col("doc_b").alias("doc_id"))
    n_kept = surv.join(drop_b, "doc_id", "left_anti").count()
    assert got["neardup"] == (n_in, n_kept)
