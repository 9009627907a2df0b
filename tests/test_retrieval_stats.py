"""Semantic checks for BM25 retrieval, rank-AUC, and containment dedup —
properties the DuckDB oracle's value-hash can't express (monotonicity,
bounds, asymmetry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
    _ngram_jaccard,
    dedup_containment,
)
from ntd_gtfs_to_socrata_spark.queries.retrieval_q import _TOPK, rag_bm25_topk
from ntd_gtfs_to_socrata_spark.queries.stats_q import eval_auc_rank


def test_bm25_topk_shape_and_rank_order(spark, sf_dir):
    rows = rag_bm25_topk(spark, sf_dir).collect()
    by_term: dict[str, list] = {}
    for r in rows:
        by_term.setdefault(r["token"], []).append(r)
    assert len(by_term) == 5  # df ranks 11-15
    for term, group in by_term.items():
        group.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in group] == list(range(1, len(group) + 1))
        assert len(group) <= _TOPK
        # rank order must agree with descending score
        scores = [r["bm25"] for r in group]
        assert scores == sorted(scores, reverse=True)
        assert all(r["bm25"] > 0 for r in group)


def test_bm25_scores_docs_containing_term_only(spark, sf_dir):
    rows = rag_bm25_topk(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert r["token"] in docs[r["doc_id"]].split()


def test_auc_bounds_and_degenerate_invariance(spark, sf_dir):
    row = eval_auc_rank(spark, sf_dir).collect()[0]
    assert 0.0 <= row["auc"] <= 1.0
    assert row["n_pos"] > 0 and row["n_neg"] > 0
    ev = load_table(spark, sf_dir, "events")
    assert row["n_pos"] + row["n_neg"] == ev.count()


def test_auc_is_half_when_score_is_constant(spark, sf_dir, tmp_path):
    # constant score => every pair is a tie => AUC must be exactly 0.5
    import os

    d = tmp_path / "sf"
    os.makedirs(d, exist_ok=True)
    ev = load_table(spark, sf_dir, "events").withColumn("value", F.lit(1.0))
    ev.write.mode("overwrite").parquet(str(d / "events.parquet"))
    row = eval_auc_rank(spark, str(d)).collect()[0]
    assert abs(row["auc"] - 0.5) < 1e-12
    assert row["n_bins"] == 1


def test_containment_asymmetric_and_superset_of_jaccard_hits(spark, sf_dir):
    cont = {
        (r["src"], r["dst"]): r["containment"]
        for r in dedup_containment(spark, sf_dir).collect()
    }
    assert cont, "fixture corpus contains near-dup docs"
    for (src, dst), c in cont.items():
        assert 0.6 <= c <= 1.0
        assert src != dst
    # any pair with Jaccard >= 0.6 must appear in BOTH directions:
    # J = common/(na+nb-common) <= common/max(na,nb) <= either containment
    jac = _ngram_jaccard(spark, sf_dir, df_cap=None).collect()
    for r in jac:
        if r["jaccard"] >= 0.6:
            assert (r["doc_a"], r["doc_b"]) in cont
            assert (r["doc_b"], r["doc_a"]) in cont


def test_length_buckets_are_powers_of_two_and_cover_corpus(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.training_prep import (
        tp_length_bucketed_batching,
    )

    rows = tp_length_bucketed_batching(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_seqs"] for r in rows) == n_docs
    for r in rows:
        assert r["bucket_len"] & (r["bucket_len"] - 1) == 0  # power of 2
        assert r["total_tokens"] <= r["padded_tokens"]
        assert 0.0 <= r["pad_ratio"] < 1.0
        assert r["n_batches"] >= 1


def test_novelty_bounds_and_duplicate_docs_score_zero(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        dedup_exact,
        text_ngram_novelty,
    )

    nov = {r["doc_id"]: r["novelty"] for r in text_ngram_novelty(spark, sf_dir).collect()}
    assert all(0.0 <= v <= 1.0 for v in nov.values())
    # exact-duplicate docs share every shingle => df >= 2 => novelty 0
    dups = [r for r in dedup_exact(spark, sf_dir).collect() if r["n_copies"] > 1]
    if dups:
        docs = load_table(spark, sf_dir, "documents")
        texts = {}
        for r in docs.collect():
            texts.setdefault(r["text"], []).append(r["doc_id"])
        for group in texts.values():
            if len(group) > 1:
                for d in group:
                    if d in nov:
                        assert nov[d] == 0.0


def test_calibration_weighted_gaps_form_valid_ece(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.stats_q import eval_calibration_bins

    rows = eval_calibration_bins(spark, sf_dir).collect()
    n = sum(r["n"] for r in rows)
    ece = sum(r["n"] / n * r["abs_gap"] for r in rows)
    assert 0.0 <= ece <= 1.0
    for r in rows:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["mean_pred"] <= 1.0
        assert 0.0 <= r["frac_pos"] <= 1.0


def test_ohlc_bar_invariants(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.time_windows import tw_ohlc_bars

    rows = tw_ohlc_bars(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1
        assert r["volume"] >= r["high"]  # sum over >=1 positive values


def test_benford_probabilities_partition_unity(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.relational import dq_benford_first_digit

    rows = dq_benford_first_digit(spark, sf_dir).collect()
    digits = {r["first_digit"] for r in rows}
    assert digits <= set(range(1, 10))
    assert abs(sum(r["observed_p"] for r in rows) - 1.0) < 0.01
    # Benford expectation itself partitions unity over digits 1..9
    import math

    assert abs(sum(math.log10(1 + 1 / d) for d in range(1, 10)) - 1.0) < 1e-12


def test_lateral_topk_matches_window_formulation(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.subqueries import sq_lateral_topk
    from pyspark.sql import Window

    got = {
        (r["c_custkey"], r["o_orderkey"]) for r in sq_lateral_topk(spark, sf_dir).collect()
    }
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") == 3)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    want = {
        (r["o_custkey"], r["o_orderkey"])
        for r in orders.join(
            cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey"
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# r8 additions: RRF hybrid fusion, PMI collocations, PSI drift
# ---------------------------------------------------------------------------


def test_rrf_hybrid_fusion_consistency(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.retrieval_q import (
        _RRF_CAND,
        _RRF_K,
        _RRF_TOPK,
        rag_rrf_hybrid,
    )

    rows = rag_rrf_hybrid(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert by_q  # at least one query doc
    for qid, group in by_q.items():
        group.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in group] == list(range(1, len(group) + 1))
        assert len(group) <= _RRF_TOPK
        for r in group:
            # fused score must equal the RRF formula applied to the
            # per-retriever ranks carried alongside it
            expect = 0.0
            if r["dense_rnk"] is not None:
                assert 1 <= r["dense_rnk"] <= _RRF_CAND
                expect += 1.0 / (_RRF_K + r["dense_rnk"])
            if r["sparse_rnk"] is not None:
                assert 1 <= r["sparse_rnk"] <= _RRF_CAND
                expect += 1.0 / (_RRF_K + r["sparse_rnk"])
            assert r["dense_rnk"] is not None or r["sparse_rnk"] is not None
            assert abs(r["rrf"] - expect) < 1e-5
            assert r["cid"] != qid
        # fused order must agree with descending rrf
        scores = [r["rrf"] for r in group]
        assert scores == sorted(scores, reverse=True)


def test_pmi_collocations_recompute_from_raw_counts(spark, sf_dir):
    import math

    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        _PMI_MIN_COUNT,
        text_pmi_collocations,
    )

    rows = text_pmi_collocations(spark, sf_dir).collect()
    assert rows and [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    uni: dict[str, int] = {}
    bi: dict[str, int] = {}
    u_total = t_total = 0
    for d in docs:
        toks = (d["text"] or "").split()
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
            u_total += 1
        for a, b in zip(toks, toks[1:]):
            bi[f"{a} {b}"] = bi.get(f"{a} {b}", 0) + 1
            t_total += 1
    for r in rows[:10]:
        x, y = r["bigram"].split(" ")
        assert r["c_xy"] == bi[r["bigram"]] >= _PMI_MIN_COUNT
        expect = math.log(
            (r["c_xy"] / t_total) / ((uni[x] / u_total) * (uni[y] / u_total))
        )
        assert abs(r["pmi"] - expect) < 1e-3


def test_psi_drift_bins_and_nonnegativity(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.relational import _PSI_BINS, dq_psi_drift

    rows = dq_psi_drift(spark, sf_dir).collect()
    assert sorted(r["bin"] for r in rows) == list(range(_PSI_BINS))
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_a"] + r["n_b"] for r in rows) == n_docs
    for r in rows:
        # (p_a - p_b) * ln(p_a / p_b) >= 0 for any two positive proportions
        assert r["psi_contrib"] >= 0.0
