"""Phase timing of sim_graph_search_topk (r14, guide §1).

Wall-clocks the index build (`_gs_search_graph` — all eager checkpoints
fire during the call) vs the beam-search loop vs the final rank, plus
one full-query noop pass for reference. Run QUIET.

Usage: python tools/slice_graph_search.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ntd_gtfs_to_socrata_spark.queries import REGISTRY, load_all_query_modules
from ntd_gtfs_to_socrata_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    load_all_query_modules()
    from ntd_gtfs_to_socrata_spark.queries import similarity_q as SQ

    spark = get_spark("slice_graph_search")
    # warm pass
    REGISTRY["sim_graph_search_topk"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for i in range(3):
        t0 = time.time()
        graph, b = SQ._gs_search_graph(spark, sf_dir)
        t1 = time.time()
        df = REGISTRY["sim_graph_search_topk"](spark, sf_dir)
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        print(
            f"pass {i}: build={t1 - t0:.3f}s full_construct={t2 - t1:.3f}s "
            f"final_exec={t3 - t2:.3f}s total_full={t3 - t1:.3f}s",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
