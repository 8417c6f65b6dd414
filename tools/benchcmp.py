"""Compare two bench records (and optionally BASELINE.md's medians).

Usage: python tools/benchcmp.py NEW.json OLD.json [threshold]
Prints per-query ratios above the threshold (default 1.3) plus
sum/median ratios over the shared queries — the round-over-round
regression check the VERDICT reads.
"""

from __future__ import annotations

import json
import statistics
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        return json.load(fh)["queries"]


def main() -> int:
    new, old = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(new) & set(old))
    ratios = {}
    for n in shared:
        if old[n] > 0:
            ratios[n] = new[n] / old[n]
    movers = sorted(
        ((r, n) for n, r in ratios.items() if r > thr and new[n] - old[n] > 0.15),
        reverse=True,
    )
    for r, n in movers:
        print(f"SLOWER {n}: {old[n]:.3f}s -> {new[n]:.3f}s ({r:.2f}x)")
    s_new, s_old = sum(new[n] for n in shared), sum(old[n] for n in shared)
    if not ratios or s_old == 0:
        print(
            f"no shared queries with nonzero old timings "
            f"(shared={len(shared)}) — records not comparable"
        )
        return 1
    print(
        f"shared={len(shared)} sum_ratio={s_new / s_old:.3f} "
        f"median_ratio={statistics.median(ratios.values()):.3f} "
        f"new_total={sum(new.values()):.1f}s ({len(new)} queries)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
