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
