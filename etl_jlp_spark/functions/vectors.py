"""Vector helpers over `array<float>` embedding columns.

All math is expressed with higher-order SQL functions (`zip_with` +
`aggregate`), which execute inside the JVM — no Python/Arrow round trip
— and mirror exactly the sequential-sum semantics of the DuckDB oracle
(`list_dot_product`), so cosine values match bit-for-bit before
rounding.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a|*|b|) — computed as dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))
    to match the oracle formula exactly."""
    return dot(a, b) / (norm(a) * norm(b))


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def normalized(col: Column) -> Column:
    """v / |v| — precompute once per row so pairwise cosine is a plain dot."""
    n = norm(col)
    return F.transform(col, lambda x: x / n)


def _col_sql(c: Column | str) -> str:
    """The SQL text of a Column (PySpark renders it in repr). Only used
    for the simple operand shapes static_dot receives (named columns,
    casts); F.expr re-parses it into the identical expression tree.

    Contract guard: aliased or otherwise bound Columns (``c.alias(...)``,
    a join-disambiguated ``df['v']``) would re-parse to a different —
    or unparseable — expression, so they are rejected up front rather
    than silently producing a wrong plan."""
    if isinstance(c, str):
        return c
    s = str(c)  # "Column<'...'>"
    sql = s[s.index("'") + 1 : s.rindex("'")]
    # an alias renders as a trailing "… AS name" (a cast's "AS" is inside
    # its parens, so a bare cast ends with ')'); '#' marks a leaked exprId
    if "#" in sql or _re.search(r"\s+AS\s+[^)\s]+$", sql):
        raise ValueError(
            f"static_dot operands must be plain column names or casts, got {sql!r}: "
            "aliased/bound Columns do not survive the repr->F.expr round trip"
        )
    return sql


def static_dot(a: Column | str, b: Column | str, dim: int) -> Column:
    """Dot product expanded to an explicit `a[0]*b[0] + … + a[d-1]*b[d-1]`
    expression. Unlike the higher-order ``aggregate`` form (interpreted
    per row), this compiles into whole-stage codegen — ~50× faster on
    pairwise workloads. Requires a statically-known dimension.

    Built as ONE parsed SQL string, not getItem/multiply Column calls:
    the Column-API loop costs ~4 py4j round trips per term (~0.7 s of
    driver latency per 64-dim call — measured r10), which dominated
    plan construction for the whole embedding family. The parsed tree
    (left-deep adds, index-sequential terms) is identical, so values
    stay bit-for-bit."""
    a_sql, b_sql = _col_sql(a), _col_sql(b)
    return F.expr(" + ".join(f"({a_sql})[{i}] * ({b_sql})[{i}]" for i in range(dim)))
