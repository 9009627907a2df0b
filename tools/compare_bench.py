"""Round-over-round bench comparison: flag real per-query regressions.

Usage: python tools/compare_bench.py OLD.json NEW.json [threshold]

Accepts either the raw one-line ``bench.py`` output or the driver's
recorded ``BENCH_r*.json`` wrapper (which nests the parsed line under
``"parsed"``). Compares only queries present in BOTH files (new queries
change the headline total legitimately — the shared-subtotal line is the
apples-to-apples number).

VARIANCE-AWARE GATING (r8 verdict task 7): ``bench.py`` records each
query's [min, max] over its timed passes under ``"spread"``. A query is
flagged only when ALL of:

  1. new_median > old_median * threshold          (relative drift)
  2. new_median - old_median > 0.15 s             (absolute floor —
     sub-150 ms swings on a shared host are scheduler noise)
  3. new_median > old_max * 1.10                  (outside the OLD run's
     own measured noise band + 10%)
  4. new_min > old_median                         (even the new run's
     BEST pass is slower than the old median — a genuinely shifted
     distribution, not one noisy pass dragging the median)

Bands 3-4 apply only where both artifacts carry spread data; older
artifacts fall back to rules 1-2 (the pre-r9 behaviour). Measured on
this box: identical code re-timed across rounds swings up to 1.8x
median-to-median while min-to-max bands overlap — rules 3-4 absorb
exactly that, so box drift stops costing a manual worktree A/B.

Exit code 1 when any regression is flagged, so this can gate CI.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = json.loads(text.splitlines()[0])
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' key (not a bench artifact)")
    return d


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.2
    old_spread = old.get("spread", {})
    new_spread = new.get("spread", {})
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    old_sub = sum(old["queries"][k] for k in shared)
    new_sub = sum(new["queries"][k] for k in shared)
    print(f"shared queries: {len(shared)}")
    print(f"shared subtotal: {old_sub:.2f}s -> {new_sub:.2f}s "
          f"({new_sub / old_sub:.2f}x)" if old_sub else "")
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_new:
        extra = sum(new["queries"][k] for k in only_new)
        print(f"new-only queries: {len(only_new)} (+{extra:.2f}s of new coverage)")
    regressions = []
    absorbed = []
    for k in shared:
        a, b = old["queries"][k], new["queries"][k]
        if not (b > a * threshold and b - a > 0.15):
            continue
        if k in old_spread and k in new_spread:
            old_max = old_spread[k][1]
            new_min = new_spread[k][0]
            if b <= old_max * 1.10 or new_min <= a:
                absorbed.append((k, a, b, old_max, new_min))
                continue
        regressions.append((k, a, b))
    for k, a, b, old_max, new_min in absorbed:
        print(
            f"noise-band {k}: {a:.3f}s -> {b:.3f}s "
            f"(old band max {old_max:.3f}s, new best pass {new_min:.3f}s — "
            "inside the measured spread, not flagged)"
        )
    for k, a, b in sorted(regressions, key=lambda r: r[1] - r[2]):
        ratio = f"{b / a:.2f}x" if a > 0 else "inf x"
        print(f"REGRESSION {k}: {a:.3f}s -> {b:.3f}s ({ratio})")
    if not regressions:
        print("no per-query regressions")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
