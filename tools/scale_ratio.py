"""Cross-scale linearity check: compare two bench artifacts at different
scale factors and flag super-linear queries (r7 verdict item 2, made a
standing gate rather than a one-off).

Usage: python tools/scale_ratio.py SMALL.json BIG.json [slack]

Both inputs are ``bench.py`` one-line outputs (or the driver's
``BENCH_r*.json`` wrapper). The data ratio is ``big.sf / small.sf``; a
query is flagged when its wall-time ratio exceeds ``data_ratio * slack``
(default slack 1.2 — a 10x data step may cost up to 12x before we call
it super-linear) AND the big-side time exceeds 1 s (sub-second queries
are fixed-overhead-dominated: job launch + planning hide the data term,
so their ratios say nothing about the algorithm).

Sub-linear ratios are expected and GOOD — fixed overhead amortizes, AQE
picks bigger-batch plans — so only the high side is flagged. Exit code 1
on any flag, so this can gate alongside tools/compare_bench.py.
"""

from __future__ import annotations

import json
import sys


# Queries whose cost law is super-linear BY DESIGN, with the documented
# exponent: allowed ratio = data_ratio ** exponent * slack. Currently
# EMPTY: SemDeDup's r6 sqrt-cells scheme was O(n^1.5) and carried a 1.5
# here until r10 moved it to constant-size cells + two-level routing
# (linear pairwise, n^1.25 FLOPs on map-side folds — measured 1.6x wall
# on the 10x sf0.1→sf1 step), so it now holds the linear bar like
# everything else.
EXPECTED_EXPONENT: dict[str, float] = {}


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
        # scale_stress output interleaves progress lines with the final
        # JSON line — take the first line that parses
        for line in text.splitlines():
            try:
                d = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
        if d is None:
            raise SystemExit(f"{path}: no JSON line found")
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d or "sf" not in d:
        raise SystemExit(f"{path}: not a bench artifact (need 'queries' + 'sf')")
    return d


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    small, big = load(sys.argv[1]), load(sys.argv[2])
    slack = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    if small["sf"] <= 0 or big["sf"] <= small["sf"]:
        raise SystemExit(f"need small.sf < big.sf, got {small['sf']} vs {big['sf']}")
    data_ratio = big["sf"] / small["sf"]
    shared = sorted(set(small["queries"]) & set(big["queries"]))
    if not shared:
        raise SystemExit("no shared queries between the two artifacts")
    print(f"data ratio: {data_ratio:.1f}x  (sf {small['sf']} -> {big['sf']}), "
          f"flag above {data_ratio * slack:.1f}x when big-side > 1s")
    flagged = []
    for k in shared:
        a, b = small["queries"][k], big["queries"][k]
        ratio = b / a if a > 0 else float("inf")
        allowed = data_ratio ** EXPECTED_EXPONENT.get(k, 1.0) * slack
        mark = ""
        if ratio > allowed and b > 1.0:
            mark = "  <-- SUPER-LINEAR"
            flagged.append(k)
        elif k in EXPECTED_EXPONENT:
            mark = f"  (design law n^{EXPECTED_EXPONENT[k]}, allowed {allowed:.0f}x)"
        print(f"  {k}: {a:.2f}s -> {b:.2f}s ({ratio:.1f}x){mark}")
    if flagged:
        print(f"FLAGGED {len(flagged)}: {flagged}")
        return 1
    print(f"OK: all {len(shared)} shared queries scale at or below "
          f"{data_ratio * slack:.1f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
