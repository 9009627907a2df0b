"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is fully executed via the no-op sink (computes every row without
driver-side collection — the honest cost of the plan, not of toPandas).
Per-query time is the median of 3 timed passes (5 when the first 3 put the
median above 1s): the container shares the host with other tenants and
single-pass totals were observed to swing 2x between identical runs; the
median rejects outlier passes in either direction (min-of-2 could report a
lucky pass, masking a real regression), and the expensive queries — where a
phantom 15% drift costs a round of chasing — get two extra rejection slots.

A query that throws is skipped-and-reported (``errors`` key), never fatal:
one broken query must not zero out a whole round's perf evidence.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ntd_gtfs_to_socrata_spark.queries import REGISTRY, load_all_query_modules
from ntd_gtfs_to_socrata_spark.session import get_spark

# Headline set: one per capability family (reference ETL shapes, relational
# analytics, windows, dedup, similarity, text). Keep in sync as families land.
HEADLINE = [
    # reference ETL shapes
    "flagship_validate_split_agg",
    "a1_validation_quarantine_counts",
    "s6_csv_cell_normalize",
    "j1_j2_feed_resolution_routing",
    "j4_upsert_merge",
    "j5_full_sync_snapshot",
    "a2_changelog_last_write_wins",
    # relational analytics
    "q1_pricing_summary",
    "q3_shipping_priority_topk",
    "q5_region_revenue",
    "q9_product_profit",
    "q13_order_distribution",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    "sq_exists_semi_join",
    "sq_correlated_scalar",
    "j6_salted_skew_join",
    "asof_join_click_to_view",
    "w2_window_functions",
    "w3_topk_per_group",
    "a6_rollup",
    "json_props_extract",
    # event-time windows + event analytics
    "tw_tumbling_counts",
    "tw_session_windows",
    "sessionize_lag_gap",
    "funnel_stages",
    "cohort_retention",
    "j8_snapshot_diff",
    "trend_monthly_growth",
    # dedup / text / similarity / UDF surface
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_prefix_filter_jaccard",
    "dedup_lines_corpus",
    "text_quality_classifier",
    "tp_dsir_importance",
    "sim_matryoshka_topk",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "text_quality_scores",
    "text_langid_ngram",
    "sim_bruteforce_topk",
    "sim_ivf_topk",
    "udf_grouped_zscore",
    "mm_frame_sample",
    # training-data prep
    "tp_hash_split",
    "tp_pack_sequences",
    "tp_contamination_check",
    # entity resolution / geospatial / tokenizer training / eval stats
    "er_blocked_matches",
    "geo_grid_neighbor_join",
    "bpe_pair_counts",
    "dedup_incremental_lsh",
    "eval_poisson_bootstrap_ci",
    # stream-stream join (batch twin) + variant extraction
    "ss_interval_join_batch",
    "f12b_variant_extract",
    # r6 additions: retrieval, rank stats, directed containment, phash LSH,
    # probabilistic linkage, OHLC downsampling, novelty, batch planning
    "rag_bm25_topk",
    "eval_auc_rank",
    "dedup_containment",
    "mm_phash_neardup",
    "er_fellegi_sunter",
    "tw_ohlc_bars",
    "text_ngram_novelty",
    "tp_length_bucketed_batching",
    # r7 additions (r6 verdict item 2): the most expensive COMPOSED
    # pipelines — precisely where subtree-recompute regressions would
    # hide — now have a round-over-round perf trace
    "release_pipeline_counts",
    "sim_semdedup_cells",
    "dedup_lsh_pipeline",
    "dedup_containment_closure",
    "graph_pagerank",
    "graph_k_core",
    "privacy_l_diversity",
    "tw_gap_fill_locf",
    "stream_incremental_lsh_dedup",
    # r8 additions: PQ ANN, hybrid retrieval fusion, collocation mining,
    # stateful streaming EWMA (bit-exact batch parity)
    "sim_pq_topk",
    "rag_rrf_hybrid",
    "text_pmi_collocations",
    "stream_ewma",
    "eval_bradley_terry",
    "tp_decontaminate_fuzzy",
    "tw_resample_interpolate",
    "sim_ivfpq_topk",
    "sim_nn_descent_round",
    "graph_modularity",
    "tw_range_frame_sum",
    "privacy_t_closeness",
    "stream_sessionize_stateful",
    "eval_pass_at_k",
    "asof_join_nearest",
    "dq_mutual_information",
    "graph_assortativity",
    "tw_cusum_drift",
    "sim_ann_multiprobe_topk",
    "text_compression_ratio",
    "dq_zipf_fit",
    "stream_psi_monitor",
    # r9 additions: real BMP pixel decode (stub surface empty for BMP),
    # graph-ANN beam search + its recall monitor
    "mm_bmp_decode",
    "mm_bmp_scene_cut",
    "sim_graph_search_topk",
    # (sim_graph_search_recall re-runs the whole topk pipeline — it is
    # oracle-gated and pytest-pinned, but benching it would double-count)
    "eval_ks_two_sample",
    "tw_funnel_stages",
    "sim_range_search",
    "bpe_train_merges_sampled",
    # r9 additions (cont.): rank statistics + soft dedup + decay scoring
    "eval_mann_whitney",
    "eval_spearman",
    "tw_exp_decay_score",
    "dedup_soft_weight",
    "sim_mmr_diversify",
    "graph_closeness_centrality",
    "eval_mcnemar",
    "tw_retention_cohorts",
    # r10 additions: real NN pixel resize, cluster-aware (leakage-free)
    # train/val/test split, real PNG decode (stdlib inflate + unfilter)
    "mm_bmp_resize",
    "tp_cluster_aware_split",
    "mm_png_decode",
    "mm_wav_decode",
    "mm_avi_frame_sample",
    "s5b_webdataset_tar_ingest",
    "mm_dispatch_decode",
    "er_em_weights",
    # r11 additions: real baseline-JPEG decode (the last image stub)
    "mm_jpeg_decode",
    "mm_jpeg_resize",
    # r12 addition: real IMA-ADPCM compressed-audio decode
    "mm_adpcm_decode",
    # r13 additions: real GIF/LZW compressed-image decode, G.711 mu-law
    # companded-audio decode
    "mm_gif_decode",
    "mm_mulaw_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    load_all_query_modules()
    spark = get_spark("bench")

    names = [n for n in HEADLINE if n in REGISTRY]
    # Optional subset (comma-separated) for scale-stress runs: the sf1
    # linearity check times only the composed pipelines rather than paying
    # 4-6 sf1 executions of all 70 headline queries.
    subset = os.environ.get("SPARK_GRAFT_QUERIES")
    if subset:
        wanted = [s.strip() for s in subset.split(",") if s.strip()]
        unknown = [w for w in wanted if w not in REGISTRY]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        names = wanted
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    warm_errors: dict[str, str] = {}
    # Warm codegen/JIT per plan at the smallest SF (plans are identical, so
    # the generated-code cache is hot); timings below then measure data-size
    # cost at the target SF, not one-time Janino compilation. A warm failure
    # is recorded but does NOT skip the measured passes — the error may be
    # warm-dir-specific, and the target SF is the judged surface.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        try:
            REGISTRY[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — record-and-continue, never fatal
            warm_errors[name] = f"warm: {type(e).__name__}: {e}"[:500]

    from ntd_gtfs_to_socrata_spark.operators.stagecache import release_all

    total = 0.0
    for name in names:
        passes: list[float] = []
        # a prior query's live stage-boundary cache would be substituted
        # into this query's plan wherever the subtrees match (timing it as
        # a cache read, not its honest cold cost) — measure cache-free;
        # within a query, each timed pass re-persists its own boundaries
        # (stage_boundary retires the previous pass's frame), so passes
        # stay honest without extra handling
        release_all()
        spark.catalog.clearCache()
        try:
            # One UNTIMED pass at the target SF first: the first execution
            # of a plan at a new data size pays one-off costs (codegen for
            # AQE-replanned stages, shuffle-file page-cache warmup) that
            # were measured to inflate pass 1 by 30-50% vs steady state.
            # The timed passes then measure the plan's data cost.
            REGISTRY[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            for _ in range(3):
                t0 = time.time()
                df = REGISTRY[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                passes.append(time.time() - t0)
            # r6 verdict item 5: >1s queries get median-of-5 — a shared
            # noisy host swings sub-second queries harmlessly (they are
            # noise-dominated either way), but a 15% phantom drift on an
            # expensive query (sim_ivf_topk r5->r6) costs a round of
            # chasing; two extra passes reject two outliers instead of one
            if statistics.median(passes) > 1.0:
                for _ in range(2):
                    t0 = time.time()
                    df = REGISTRY[name](spark, sf_dir)
                    df.write.format("noop").mode("overwrite").save()
                    passes.append(time.time() - t0)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"measure: {type(e).__name__}: {e}"[:500]
            continue
        med = statistics.median(passes)
        timings[name] = round(med, 3)
        spread[name] = [round(min(passes), 3), round(max(passes), 3)]
        total += med

    out = {
        "metric": "headline_query_total_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        # per-query [min, max] over the timed passes (r8 verdict task 7):
        # the measured noise band compare_bench gates regressions against,
        # so shared-host drift stops costing a manual worktree A/B
        "spread": spread,
        "n_queries": len(timings),
        "sf": sf,
        # how many headline queries the total does NOT cover — consumers
        # must not compare totals across rounds with different n_skipped
        "n_skipped": len(names) - len(timings),
    }
    if errors:
        out["errors"] = errors
    if warm_errors:
        out["warm_errors"] = warm_errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
