"""Timestamp-type-tolerant event-time helpers.

The testdata parquet has carried its timestamps both ways across
driver regenerations: TIMESTAMP(NANOS) (reads as long under
``nanosAsLong``) and plain micros with ``isAdjustedToUTC=false``
(reads as TIMESTAMP_NTZ under Spark's default NTZ inference). The
catalog normalizes scans to the classic TIMESTAMP type, but operators
also receive frames from streams, JDBC, or caller-built DataFrames —
so epoch arithmetic must not assume the LTZ type that
``F.unix_micros`` requires.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column) -> Column:
    """Microseconds since epoch for TIMESTAMP *or* TIMESTAMP_NTZ input.

    NTZ input is cast to LTZ first — an exact identity under the UTC
    session timezone the engine pins (session.py / catalog.py), and the
    same value DuckDB's ``epoch_us`` produces on the naive timestamp.
    On LTZ input the cast is a no-op and the plan is unchanged.
    """
    return F.unix_micros(col.cast("timestamp_ltz"))
