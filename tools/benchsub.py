"""Bench a SUBSET of declared queries with the bench.py methodology
(noop sink, median of reps, alternating sweeps) — the fast inner loop
for optimization work, so a 3-query change does not need a 374-query
full bench to measure.

Usage: python tools/benchsub.py OUT.json query [query ...]
Env:   SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPS (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def main() -> int:
    out_path, names = sys.argv[1], sys.argv[2:]
    import __spark_entry__ as ent
    from etl_jlp_spark.session import get_spark

    spark = get_spark("benchsub")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 1

    # same warmup as bench.py: JVM + file listing + the persisted stores
    qs["q1_pricing_summary"](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    from etl_jlp_spark.operators.ir import ensure_ir_index
    from etl_jlp_spark.operators.similarity import ensure_ivf_store

    ensure_ivf_store(spark, SF_DIR)
    ensure_ir_index(spark, SF_DIR)

    runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(REPS):
        for n in names:
            spark.sparkContext.setJobDescription(n)
            t0 = time.perf_counter()
            qs[n](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            runs[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    timings = {n: round(statistics.median(ts), 3) for n, ts in runs.items()}
    rec = {
        "metric": "subset",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "reps": REPS,
        "all_runs": {n: [round(t, 3) for t in ts] for n, ts in runs.items()},
    }
    with open(out_path, "w") as fh:
        json.dump(rec, fh, indent=1)
    for n in names:
        print(f"{timings[n]:8.3f}  {n}   (runs: {['%.2f' % t for t in runs[n]]})")
    print(f"total {rec['value']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
