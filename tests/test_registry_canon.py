"""The registry's oracle-driven −0.0 canonicalization layer.

Oracles append ``+ 0.0`` to rounded signed outputs; the registry parses
those column names out of the oracle SQL and mirrors the canon on the
Spark side (registry._with_zero_canon). These tests pin the parse, the
wrap semantics (−0.0 → +0.0 and NOTHING else), and the end-to-end
guarantee that the round-8 driver incident class — a Spark-side −0.0
hashing differently from the oracle's canonicalized +0.0 — cannot recur
for any registered query.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__  # noqa: F401  — populates the registry
from etl_jlp_spark import registry


def test_canon_cols_parses_named_sites():
    sql = """
    SELECT a, round(x, 6) + 0.0 AS z_stat,
           CASE WHEN c THEN round(y, 4) + 0.0 ELSE 0.0 END AS gated,
           round(w, 2) + 0.0
             AS wrapped_newline
    FROM t
    """
    cols = registry._canon_cols("nosuch", sql)
    assert cols == frozenset({"z_stat", "gated", "wrapped_newline"})


def test_canon_cols_merges_hand_audited_overrides():
    cols = registry._canon_cols("theil_sen_trend", "SELECT 1 AS x FROM t")
    assert {"slope_per_day", "intercept"} <= cols


def test_zero_canon_normalizes_only_negative_zero(spark):
    rows = [(-0.0, -0.0, 1.5, None), (2.25, -3.5, -0.0, -7.125)]

    def fn(spark_, sf_dir_):
        return spark_.createDataFrame(
            rows, "canon double, untouched double, other double, nullable double"
        )

    wrapped = registry._with_zero_canon(fn, frozenset({"canon", "nullable"}))
    out = wrapped(spark, "ignored")
    got = [tuple(r) for r in out.orderBy("other").collect()]  # −0.0 < 1.5
    # canon'd −0.0 → +0.0 (copysign distinguishes); untouched keeps −0.0
    assert math.copysign(1.0, got[1][0]) == 1.0 and got[1][0] == 0.0
    assert math.copysign(1.0, got[1][1]) == -1.0
    # non-zero values bit-identical; NULL stays NULL
    assert got == [(2.25, -3.5, -0.0, -7.125), (0.0, -0.0, 1.5, None)]


def test_zero_canon_skips_non_double_columns(spark):
    def fn(spark_, sf_dir_):
        return spark_.createDataFrame([(1, "x")], "n long, s string")

    wrapped = registry._with_zero_canon(fn, frozenset({"n", "s"}))
    out = wrapped(spark, "ignored")
    assert out.schema.simpleString() == "struct<n:bigint,s:string>"
    assert out.collect() == [(1, "x")]


def test_every_registered_query_is_canon_wrapped():
    """Every oracle-backed query whose SQL canonicalizes at least one
    column must be stored WRAPPED in the registry (closure check — a
    future register() refactor that drops the wrap fails here)."""
    needing = [
        n
        for n, sql in registry.ORACLES.items()
        if registry._canon_cols(n, sql)
    ]
    assert len(needing) > 100  # the class is systemic, not incidental
    for n in needing:
        fn = registry.QUERIES[n]
        assert getattr(fn, "__wrapped__", None) is not None, n  # wraps marker


# Hand-audited oracle canon sites the alias regex CANNOT name (positional
# UNION-branch columns, scalar subqueries). Keys: query name → number of
# unnamed `+ 0.0` occurrences, each verified to canonicalize a final-output
# column that _canon_cols already covers via another route (the named first
# UNION branch / _CANON_EXTRA). Any NEW unnamed site fails the test below
# until it is audited and either regex-covered or listed here.
_AUDITED_UNNAMED = {
    # 2nd/3rd UNION ALL branches of r_pair / r_partial (named in branch 1)
    "partial_corr_matrix": 4,
    # scalar subquery (SELECT round(avg(r), 2) + 0.0 FROM resid ...) AS
    # intercept — the alias sits past the subquery's FROM; _CANON_EXTRA
    # carries the column name
    "theil_sen_trend": 1,
}


def test_every_oracle_canon_site_is_captured_or_audited():
    """Inverse completeness: every `+ 0.0` occurrence in every oracle
    must be either captured by the alias regex or accounted for in the
    audited-unnamed table — a future oracle spelling the canon in a
    form the regex misses cannot silently lose the Spark-side mirror
    (the round-8 −0.0 driver-hash class)."""
    for name, sql in registry.ORACLES.items():
        total = len(registry._CANON_ANY.findall(sql))
        named = len(list(registry._CANON_AS.finditer(sql)))
        unnamed = total - named
        assert unnamed == _AUDITED_UNNAMED.get(name, 0), (
            name,
            f"{unnamed} unaudited unnamed '+ 0.0' site(s)",
        )
        if name in _AUDITED_UNNAMED:
            # the unnamed sites must still resolve to canon'd columns
            assert registry._canon_cols(name, sql), name


@settings(max_examples=30, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_plus_zero_is_ieee_identity_except_negative_zero(x):
    """The mathematical fact the whole layer rests on: x + 0.0 == x
    bit-for-bit for every finite double EXCEPT −0.0 → +0.0."""
    y = x + 0.0
    if x == 0.0 and math.copysign(1.0, x) < 0:
        assert math.copysign(1.0, y) > 0
    else:
        assert y == x and math.copysign(1.0, y) == math.copysign(1.0, x)


def test_exact_sum_null_poisons_instead_of_skipping(spark):
    """exact_sum (functions/algebra.py): under ansi=false (the common
    perf-tuned cluster config — ANSI sessions already THROW on decimal
    overflow, loud by itself) a plain F.sum SKIPS an overflow-NULLed
    decimal row, silently shrinking the statistic; exact_sum NULLs the
    whole aggregate instead. Overflow is a real DECIMAL(38,0) multiply
    overflow, not a literal NULL."""
    from pyspark.sql import functions as F

    from etl_jlp_spark.functions.algebra import exact_sum

    ansi_before = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        df = spark.createDataFrame([(1, 2), (1, 9), (2, 9)], "grp int, x long").select(
            "grp", F.col("x").cast("decimal(38,0)").alias("x")
        )
        # x * 2*10^37: the MULTIPLY overflows decimal(38,0) for x=9
        # (1.8e38), survives for x=2 (4e37)
        prod = F.col("x") * F.expr(f"CAST('{2 * 10**37}' AS DECIMAL(38,0))")
        out = {
            r["grp"]: (r["skipping"], r["poisoned"])
            for r in df.groupBy("grp")
            .agg(
                F.sum(prod).alias("skipping"),
                exact_sum(prod).alias("poisoned"),
            )
            .collect()
        }
        assert out[1][0] is not None  # F.sum silently kept only the x=2 row
        assert out[1][1] is None  # exact_sum poisons the whole group
        assert out[2] == (None, None)  # every row overflowed: both NULL
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_before)
