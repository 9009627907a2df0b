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

Isolation (r11 verdict item 5): by default every query runs in its OWN
subprocess/JVM — the r11 sweep shared one long-lived session, and heap/
cache interference charged up to 2.4x of a query's cost to whichever
query ran late in the sweep (er_entity_clusters: 4.5x in-sweep vs 1.9x
isolated on identical code). Per-query JVM startup (~5-8 s) is recorded
separately as "overhead_sec" so the per-query numbers stay clean.
``--no-isolate`` restores the shared-session mode (and is what the
parent invokes per child).

Usage:
  python tools/scale_stress.py SF_DIR [--timeout SEC] [--no-isolate] [q1 q2 ...]
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


def _run_isolated(sf_dir: str, timeout: float, names: list[str], sf: float) -> int:
    """Parent mode: one child process (fresh JVM) per query; merge the
    children's JSON lines. Child wall-clock minus its self-reported query
    time accumulates into overhead_sec so JVM startup never pollutes the
    per-query numbers."""
    import subprocess

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    overhead = 0.0
    for name in names:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    sf_dir,
                    "--timeout",
                    str(timeout),
                    "--no-isolate",
                    name,
                ],
                capture_output=True,
                text=True,
                timeout=timeout + 180,
            )
            line = next(
                (
                    ln
                    for ln in reversed(proc.stdout.splitlines())
                    if ln.startswith("{")
                ),
                None,
            )
            child = json.loads(line) if line else {"queries": {}, "errors": {}}
            timings.update(child.get("queries", {}))
            errors.update(child.get("errors", {}))
            if name in child.get("queries", {}):
                print(f"[{name}] {child['queries'][name]:.1f}s", flush=True)
                overhead += (time.time() - t0) - child["queries"][name]
            else:
                msg = child.get("errors", {}).get(name, "no result line")
                errors[name] = msg
                print(f"[{name}] {msg}", flush=True)
        except subprocess.TimeoutExpired:
            errors[name] = f"HARD-TIMEOUT after {time.time()-t0:.0f}s"
            print(f"[{name}] {errors[name]}", flush=True)
    out = {
        "metric": "scale_stress_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf,
        "isolation": "per-query JVM",
        "overhead_sec": round(overhead, 1),
    }
    print(json.dumps(out), flush=True)
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    timeout = 600.0
    if "--timeout" in args:
        i = args.index("--timeout")
        timeout = float(args[i + 1])
        del args[i : i + 2]
    isolate = "--no-isolate" not in args
    if not isolate:
        args.remove("--no-isolate")
    sf_dir = args[0]
    names = args[1:] or DEFAULT
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    if isolate:
        return _run_isolated(sf_dir, timeout, names, sf)

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
        # Cold-JVM warm-up (r12): per-query isolation means the timed run
        # would otherwise pay classloading/codegen/JIT inside its number
        # (measured +8-14 s at sf1 on a fresh JVM). Run the SAME query at
        # the tiniest fixture untimed first — JIT warmth survives the
        # cache clear below, data caching does not.
        warmup_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warmup_dir) and os.path.abspath(
            warmup_dir
        ) != os.path.abspath(sf_dir):
            try:
                REGISTRY[name](spark, warmup_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 — warm-up is best-effort
                pass
            release_all()
            spark.catalog.clearCache()
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
