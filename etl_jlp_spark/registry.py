"""Operator registry: maps SURVEY.md §2 keys → (spark fn, oracle SQL).

Each operator module registers its queries here; ``__spark_entry__``
re-exports the registry for the driver. A spark fn has signature
``(spark, sf_dir) -> DataFrame``; the oracle is ANSI SQL DuckDB runs on
the same parquet tables (views pre-registered by the driver). ``None``
oracle ⇒ rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

import functools
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# IEEE −0.0 canonicalization, driven by the oracle text.
#
# Oracles append ``+ 0.0`` to rounded signed outputs so DuckDB never emits
# −0.0 into the driver's value hash. The Spark side must mirror that
# site-for-site or a negative statistic rounding to zero hashes differently
# (the round-8 ``cliffs_delta_value`` driver failure was exactly this
# class). Rather than hand-mirroring ~280 expression sites, the registry
# wraps every oracle-backed query: the column names the oracle
# canonicalizes are parsed out of its SQL, and the matching DOUBLE output
# columns get ``+ 0.0`` applied after the query builds its plan. Adding
# +0.0 is the IEEE identity on every double except −0.0 → +0.0, so the
# wrap can never change a value the oracle wouldn't also have changed.
# Catalyst collapses the extra Project into the final stage — no plan cost.
# ---------------------------------------------------------------------------

_CANON_AS = re.compile(
    # ELSE is restricted to NUMERIC literals: an ELSE column-ref could emit
    # −0.0 identically in both engines, where one-sided canon would diverge.
    r"\+\s*0\.0(?:\s+ELSE\s+[\d.eE+-]+)?(?:\s+END)?\s*\)?\s+AS\s+(\w+)",
    re.IGNORECASE,
)

# Matches ANY oracle canon site, named or not — tests/test_registry_canon.py
# asserts every occurrence is either captured by _CANON_AS or accounted for
# in its hand-audited unnamed-site table, so an oracle spelling the canon in
# a form the alias regex misses cannot silently lose Spark-side mirroring.
_CANON_ANY = re.compile(r"\+\s*0\.0")

# Final-output columns whose oracle canonicalization the regex cannot see
# (renamed CTE refs, scalar subqueries) — audited by hand; see each oracle.
_CANON_EXTRA: dict[str, tuple[str, ...]] = {
    # slope_per_day = (SELECT slope_med FROM med) where med canonicalizes;
    # intercept = scalar subquery (SELECT round(avg(r), 2) + 0.0 ...) AS intercept
    "theil_sen_trend": ("slope_per_day", "intercept"),
}


def _canon_cols(name: str, oracle: str) -> frozenset[str]:
    cols = {m.group(1).lower() for m in _CANON_AS.finditer(oracle)}
    cols.update(c.lower() for c in _CANON_EXTRA.get(name, ()))
    return frozenset(cols)


def _with_zero_canon(fn: QueryFn, cols: frozenset[str]) -> QueryFn:
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = fn(spark, sf_dir)
        for field in df.schema.fields:
            if field.name.lower() in cols and isinstance(field.dataType, DoubleType):
                df = df.withColumn(field.name, F.col(field.name) + F.lit(0.0))
        return df

    return wrapped


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if oracle is not None:
        cols = _canon_cols(name, oracle)
        if cols:
            fn = _with_zero_canon(fn, cols)
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def query(name: str, oracle: str | None = None):
    """Decorator form of :func:`register`."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def reorder(priority: list[str]) -> None:
    """Rebuild the registries with ``priority`` names first (remaining
    entries keep their registration order).

    The driver's correctness gate records a bounded window of queries in
    dict-iteration order, so the window must be steerable: each round the
    names that most need a fresh driver row go first (see SURVEY.md §8
    "correctness-window rotation")."""
    missing = [n for n in priority if n not in QUERIES]
    if missing:
        raise KeyError(f"reorder: unknown query names {missing}")
    ordered = list(dict.fromkeys(priority)) + [n for n in QUERIES if n not in set(priority)]
    for d in (QUERIES, ORACLES):
        tail = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(tail)
