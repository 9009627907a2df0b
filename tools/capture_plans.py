"""Capture ``explain("formatted")`` output per query into plan files.

Writes ``plans/<tag>/<query>_<suffix>.txt`` for each named query — the
before/after plan evidence the optimization rounds commit alongside the
bench numbers.

Usage: python tools/capture_plans.py TAG SUFFIX [sf_dir] q1 [q2 ...]
  e.g. python tools/capture_plans.py r13 before /root/testdata/sf0.1 \
           dedup_lsh_pipeline sim_graph_search_topk
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntd_gtfs_to_socrata_spark.operators.stagecache import release_all
from ntd_gtfs_to_socrata_spark.queries import REGISTRY, load_all_query_modules
from ntd_gtfs_to_socrata_spark.session import get_spark


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    tag, suffix, sf_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    load_all_query_modules()
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    import contextlib
    import io

    for name in names:
        release_all()
        spark.catalog.clearCache()
        df = REGISTRY[name](spark, sf_dir)
        # public API only (ADVICE r13): explain() prints to stdout; the
        # private PythonSQLUtils.explainString route breaks silently
        # across Spark upgrades
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    release_all()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
