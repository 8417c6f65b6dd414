"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB against the same sf dir, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with stable float formatting).

Usage: python tools/parity.py [--strict] [sf_dir] [query ...]

``--strict`` switches the float canon from ``.6f`` to ``repr`` (shortest
round-trip representation, up to 17 significant digits, −0.0 distinct
from +0.0). The driver's own float canon proved STRICTER than the
default ``.6f`` in round 8 (``cliffs_delta_value`` hashed differently at
the driver while matching here), so a green strict sweep is the stronger
guarantee: it requires bit-identical doubles, which the repo's
identical-expression-text / integer-rounding disciplines are designed to
deliver.
"""

from __future__ import annotations

import hashlib
import math
import sys
import traceback

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

STRICT = False


def canon(val: object) -> str:
    if val is None:
        return "<null>"
    if isinstance(val, bool):
        return "true" if val else "false"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        if STRICT:
            # bit-exact: shortest round-trip repr, −0.0 ≠ +0.0
            return repr(val)
        # round to 6 significant-ish decimals to absorb engine noise
        return f"{val:.6f}"
    return str(val)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), digest


def main() -> int:
    import duckdb

    import __spark_entry__ as ent
    from etl_jlp_spark.session import get_spark

    args = sys.argv[1:]
    if "--strict" in args:
        global STRICT
        STRICT = True
        args = [a for a in args if a != "--strict"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    spark = get_spark("parity")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = res.columns
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: oracle error")
            traceback.print_exc()
            failures += 1
            continue
        sn, sh = table_hash(scols, srows)
        on, oh = table_hash(ocols, orows)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name}: columns differ spark={sorted(scols)} oracle={sorted(ocols)}")
            failures += 1
        elif sn != on:
            print(f"FAIL  {name}: rows spark={sn} oracle={on}")
            failures += 1
        elif sh != oh:
            print(f"FAIL  {name}: value hash mismatch ({sn} rows)")
            idx = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("\x01".join(canon(r[i]) for i in idx) for r in srows)
            oset = sorted("\x01".join(canon(r[i]) for i in idx) for r in orows)
            diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            for a, b in diffs:
                print(f"   spark : {a[:200]}")
                print(f"   oracle: {b[:200]}")
            failures += 1
        else:
            print(f"OK    {name}: {sn} rows hash={sh}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
