"""Interleaved per-query A/B between two trees (r12 verdict item 1).

Runs ``bench.py`` with a query SUBSET in a FRESH process per leg,
alternating tree A and tree B for N rounds (A,B,A,B,...), so slow box
drift hits both sides equally. Each leg is its own JVM — no shared
session, no fixture-order coupling; bench.py's own median-of-5 per
query still applies inside each leg.

Per-query output: per-leg medians, the cross-leg median-of-medians and
[min, max] band per tree, and the ratio — the per-query evidence the
r12 verdict asked for (LOCALGATE_r12's 3-query-sum "parity" claim
masked a 1.67x single-query move).

Usage:
  python tools/ab_interleave.py TREE_A TREE_B q1,q2[,...] [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys


def run_leg(tree: str, queries: str, sf_dir: str) -> dict[str, float]:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_QUERIES"] = queries
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    tree_a, tree_b, queries = sys.argv[1], sys.argv[2], sys.argv[3]
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"
    qnames = [q.strip() for q in queries.split(",")]
    legs: dict[str, list[dict[str, float]]] = {"A": [], "B": []}
    for i in range(rounds):
        for label, tree in (("A", tree_a), ("B", tree_b)):
            med = run_leg(tree, queries, sf_dir)
            legs[label].append(med)
            print(f"round {i+1} {label} ({tree}): "
                  + " ".join(f"{q}={med.get(q, float('nan')):.3f}s" for q in qnames),
                  flush=True)
    summary = {}
    for q in qnames:
        a = [m[q] for m in legs["A"] if q in m]
        b = [m[q] for m in legs["B"] if q in m]
        summary[q] = {
            "A_median": round(statistics.median(a), 3),
            "A_band": [round(min(a), 3), round(max(a), 3)],
            "B_median": round(statistics.median(b), 3),
            "B_band": [round(min(b), 3), round(max(b), 3)],
            "ratio_B_over_A": round(statistics.median(b) / statistics.median(a), 3),
            "overlap": min(b) <= max(a) and min(a) <= max(b),
        }
    print(json.dumps({"tree_a": tree_a, "tree_b": tree_b, "rounds": rounds,
                      "sf_dir": sf_dir, "per_query": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
