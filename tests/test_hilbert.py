"""Curve-math replica + layout invariants for hilbert_layout_report."""

import duckdb

from tests.conftest import SF_SMALL

import __spark_entry__ as ent
from etl_jlp_spark.operators.layout import Z_BITS

QS = ent.queries()


def _xy2d(x: int, y: int, bits: int = Z_BITS) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_sql_matches_reference_algorithm():
    """The portable-SQL step expressions must reproduce the canonical
    xy2d on the full grid corner/edge cases and a dense sub-grid."""
    from etl_jlp_spark.operators.layout import _hilbert_steps

    n = 1 << Z_BITS
    pts = [(0, 0), (n - 1, 0), (0, n - 1), (n - 1, n - 1), (127, 128), (128, 127)]
    pts += [(x, y) for x in range(0, n, 37) for y in range(0, n, 41)]
    con = duckdb.connect()
    sql = "SELECT x, y, CAST(0 AS BIGINT) AS d FROM pts"
    con.sql("CREATE TABLE pts AS SELECT unnest($1) AS x, unnest($2) AS y",
            params=([p[0] for p in pts], [p[1] for p in pts]))
    cur = "h0"
    full = f"WITH h0 AS (SELECT x, y, CAST(0 AS BIGINT) AS d, x AS ox, y AS oy FROM pts)"
    for i, (x, y, d) in enumerate(_hilbert_steps(), start=1):
        full += f", h{i} AS (SELECT {x} AS x, {y} AS y, {d} AS d, ox, oy FROM h{i-1})"
        cur = f"h{i}"
    got = con.sql(full + f" SELECT ox, oy, d FROM {cur}").fetchall()
    for ox, oy, d in got:
        assert d == _xy2d(ox, oy), (ox, oy, d)


def test_hilbert_is_bijective_on_subgrid():
    seen = set()
    for x in range(64):
        for y in range(64):
            seen.add(_xy2d(x * 4, y * 4))
    assert len(seen) == 64 * 64


def test_hilbert_spans_no_worse_than_zorder(spark):
    rows = QS["hilbert_layout_report"](spark, SF_SMALL).collect()
    by_layout = {"hilbert": [], "zorder": []}
    for r in rows:
        by_layout[r["layout"]].append(r)
    assert by_layout["hilbert"] and by_layout["zorder"]
    # every file keeps positive rows and sane spans
    for r in rows:
        assert r["n_rows"] > 0
        assert 0.0 < r["span_part"] <= 1.0
        assert 0.0 < r["span_supp"] <= 1.0
    # the curve exists to bound the WORST file: hilbert's worst combined
    # span must not exceed zorder's by more than a small tolerance
    worst = {
        lay: max(r["span_part"] + r["span_supp"] for r in rs)
        for lay, rs in by_layout.items()
    }
    assert worst["hilbert"] <= worst["zorder"] + 0.15, worst
