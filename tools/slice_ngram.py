"""Per-stage noop timing of the `_ngram_jaccard` pipeline (r14, guide §1.4).

Times each prefix of the shared candidate-pairs pipeline through the noop
sink so the stage deltas attribute the ~2-3 s floor that ~10 benched
queries pay. Run QUIET (no concurrent JVMs).

Usage: python tools/slice_ngram.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import ensure_min_parallelism, load_table
from ntd_gtfs_to_socrata_spark.operators import textops as TX
from ntd_gtfs_to_socrata_spark.session import get_spark


def timeit(name, make_df, n=3):
    times = []
    for _ in range(n + 1):  # first pass untimed (warm)
        t0 = time.time()
        make_df().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    med = statistics.median(times[1:])
    print(f"{name:30s} median={med:.3f}s passes={[round(t,3) for t in times]}", flush=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("slice_ngram")
    df_cap = 50

    def docs():
        return ensure_min_parallelism(load_table(spark, sf_dir, "documents"))

    def shingled():
        return docs().select(
            "doc_id", TX.word_shingles(TX.tokens(F.col("text"))).alias("sh")
        )

    def exploded():
        return (
            shingled()
            .select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle_s"))
            .select("doc_id", "n_sh", F.xxhash64("shingle_s").alias("shingle"))
        )

    def inv():
        e = exploded()
        return (
            e.groupBy("shingle")
            .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
            .filter((F.size("ds") > 1) & (F.size("ds") <= df_cap))
        )

    def pairs():
        combos = F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                    lambda y: F.struct(x.alias("a"), y.alias("b")),
                ),
            )
        )
        compatible = (
            F.least(F.col("p.a.n_sh"), F.col("p.b.n_sh")) * 6
            >= F.col("p.a.n_sh") + F.col("p.b.n_sh")
        )
        return (
            inv()
            .select(F.explode(combos).alias("p"))
            .filter(compatible)
            .groupBy(
                F.col("p.a.doc_id").alias("doc_a"),
                F.col("p.b.doc_id").alias("doc_b"),
                F.col("p.a.n_sh").alias("na"),
                F.col("p.b.n_sh").alias("nb"),
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )

    timeit("docs_scan", docs)
    timeit("shingled", shingled)
    timeit("exploded_hashed", exploded)
    timeit("inverted_index", inv)
    timeit("pairs_agg", pairs)
    n_inv = inv().count()
    n_pairs = pairs().count()
    print(f"postings={n_inv} pairs={n_pairs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
