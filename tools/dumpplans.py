"""Dump .explain("formatted") for named declared queries to files.

Usage: python tools/dumpplans.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt per query. Queries whose builders
run driver-side actions (k-means training collects, store builds) pay
that cost; the explain itself does not execute the returned plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    args = sys.argv[1:]
    final = "--final" in args  # run the query first → AQE final plan
    if final:
        args.remove("--final")
    outdir, suffix, names = args[0], args[1], args[2:]
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as ent
    from etl_jlp_spark.session import get_spark

    spark = get_spark("dumpplans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    for n in names:
        df = qs[n](spark, SF_DIR)
        if final:
            df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{n}: wrote {path} ({n_exch} Exchange, "
              f"{plan.count('SortMergeJoin')} SMJ, {plan.count('BroadcastHashJoin')} BHJ, "
              f"{plan.count('Window')} Window)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
