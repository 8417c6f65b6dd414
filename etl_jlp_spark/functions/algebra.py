"""Exact-integer aggregation guards shared by the statistic families.

The integer-exact pipelines (drift grid, ACF, pair counts) accumulate
DECIMAL(38,0) products whose inputs are never legitimately NULL — so
after the arithmetic, NULL ⇔ overflow. Under ANSI mode (the Spark 4
default, and what the driver's vanilla session runs) a decimal overflow
already THROWS — loud, matching the DuckDB oracles, which raise on the
same overflow (HUGEINT/DECIMAL both). The danger is the common
perf-tuned deployment with ``spark.sql.ansi.enabled=false``: there the
overflow degrades to NULL and a bare ``F.sum`` SKIPS it, silently
shrinking the statistic. ``exact_sum`` restores loudness for that
configuration: if ANY row of the aggregate NULLed, the whole sum is
NULL (rows/hash then diverge from the oracle instead of matching a
plausible-but-small value). Under ANSI it is a no-op guard.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: Column) -> Column:
    """Sum that NULL-poisons instead of skipping NULLed (overflowed)
    rows. ONLY for expressions whose inputs are non-null by
    construction — a legitimately nullable input would false-poison."""
    return F.when(F.count(F.lit(1)) == F.count(col), F.sum(col))
