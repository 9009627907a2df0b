"""Single-pass scale-stress runner (r7 verdict item 2).

``bench.py`` is the precision instrument (warm + untimed + median-of-N);
at sf1 that methodology multiplies every pathological query by ~6 passes
and a super-linear pipeline can burn hours before the first number
appears. This tool answers the scale question cheaply: ONE timed pass
per query, a progress line printed (and flushed) as each query finishes,
and a per-query watchdog that cancels the job group after ``--timeout``
seconds so a blown-up plan is recorded as TIMEOUT instead of wedging the
whole run. Output ends with a bench-compatible JSON line usable by
tools/scale_ratio.py.

Usage:
  python tools/scale_stress.py SF_DIR [--timeout SEC] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntd_gtfs_to_socrata_spark.operators.stagecache import release_all
from ntd_gtfs_to_socrata_spark.queries import REGISTRY, load_all_query_modules
from ntd_gtfs_to_socrata_spark.session import get_spark

DEFAULT = [
    "release_pipeline_counts",
    "dedup_lsh_pipeline",
    "stream_incremental_lsh_dedup",
    "graph_pagerank",
    "graph_k_core",
    "sim_semdedup_cells",
    "er_entity_clusters",
    "dedup_containment_closure",
    "rag_bm25_topk",
]


def main() -> int:
    args = [a for a in sys.argv[1:]]
    timeout = 600.0
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0]
    names = args[1:] or DEFAULT
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    load_all_query_modules()
    spark = get_spark("scale-stress")
    sc = spark.sparkContext

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        release_all()
        spark.catalog.clearCache()
        group = f"stress-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        done = threading.Event()

        def watchdog() -> None:
            if not done.wait(timeout):
                sc.cancelJobGroup(group)

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.time()
        try:
            REGISTRY[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 3)
            print(f"[{name}] {timings[name]:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — record-and-continue
            elapsed = time.time() - t0
            kind = "TIMEOUT" if elapsed >= timeout else type(e).__name__
            errors[name] = f"{kind} after {elapsed:.0f}s"
            print(f"[{name}] {errors[name]}", flush=True)
        finally:
            done.set()
            sc.setJobGroup("", "")
    release_all()
    out = {
        "metric": "scale_stress_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf,
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
