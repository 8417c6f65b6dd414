"""Operator registry: maps SURVEY.md §2 keys → (spark fn, oracle SQL).

Each operator module registers its queries here; ``__spark_entry__``
re-exports the registry for the driver. A spark fn has signature
``(spark, sf_dir) -> DataFrame``; the oracle is ANSI SQL DuckDB runs on
the same parquet tables (views pre-registered by the driver). ``None``
oracle ⇒ rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
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
