"""Invariants for the ER / geo / BPE families beyond the oracle hash:
blocking recall, match-precision flags, grid-candidate soundness near the
threshold, BPE weighting arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries.entity_res import (
    er_blocked_matches,
    er_entity_clusters,
    geo_grid_neighbor_join,
)
from ntd_gtfs_to_socrata_spark.queries.tokenizer_q import (
    bpe_pair_counts,
    bpe_top_merge,
)

SF = "/root/testdata/sf0.001"


def test_er_blocking_recall_is_total(spark):
    """Every customer must rediscover its own corrupted record: the
    blocking key uses only corruption-invariant attributes, so true-match
    recall is 100% by construction."""
    n_customers = load_table(spark, SF, "customer").count()
    matches = er_blocked_matches(spark, SF)
    true_matches = matches.filter(F.col("is_true_match") == 1)
    assert true_matches.count() == n_customers
    # a true match is a single-char deletion -> edit distance exactly 1
    assert true_matches.filter(F.col("lev") != 1).count() == 0


def test_er_clusters_cover_all_matched_nodes(spark):
    matches = er_blocked_matches(spark, SF)
    clusters = er_entity_clusters(spark, SF).collect()
    comp = {r["node"]: r["component_id"] for r in clusters}
    # every matched pair landed in the same component
    for r in matches.collect():
        assert comp[r["custkey_clean"]] == comp[-r["custkey_dirty"]]


def test_geo_candidates_respect_distance_threshold(spark):
    rows = geo_grid_neighbor_join(spark, SF).collect()
    assert all(r["dist_km"] <= 100.0 for r in rows)


def test_geo_grid_is_complete_within_radius(spark):
    """TRUE completeness, brute-forced over ALL supplier×customer pairs
    (no grid pre-filter): every pair within 100 km must appear in the
    grid join output. This is the property the ±60° domain + 2° cell +
    3×3 neighborhood sizing guarantees — a 2° lon cell spans ≥ 111 km
    down to cos 60°, so a within-100 km pair can never be more than one
    cell apart on either axis."""
    import math

    def coords(key, mlat, mlon):
        return ((key * mlat) % 1200) / 10.0 - 60.0, ((key * mlon) % 3600) / 10.0 - 180.0

    cust = {
        r["c_custkey"]: coords(r["c_custkey"], 7919, 104729)
        for r in load_table(spark, SF, "customer").select("c_custkey").collect()
    }
    supp = {
        r["s_suppkey"]: coords(r["s_suppkey"], 4409, 9973)
        for r in load_table(spark, SF, "supplier").select("s_suppkey").collect()
    }

    def hav(a, b):
        lat1, lon1 = a
        lat2, lon2 = b
        rad = math.radians
        h = (
            math.sin(rad(lat2 - lat1) / 2) ** 2
            + math.cos(rad(lat1)) * math.cos(rad(lat2)) * math.sin(rad(lon2 - lon1) / 2) ** 2
        )
        return 2 * 6371.0088 * math.asin(math.sqrt(h))

    expected = {
        (sk, ck)
        for sk, sp in supp.items()
        for ck, cp in cust.items()
        if hav(sp, cp) <= 100.0
    }

    got = {
        (r["s_suppkey"], r["c_custkey"])
        for r in geo_grid_neighbor_join(spark, SF).collect()
    }
    assert got == expected


def test_bpe_counts_are_frequency_weighted(spark):
    """Hand corpus: 'ab' twice and 'abc' once -> pair 'ab' weight 3,
    'bc' weight 1; single-char tokens contribute nothing."""
    df = spark.createDataFrame([("ab ab abc",), ("x",)], "text string")
    tok_counts = (
        df.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.length("tok") >= 2)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = tok_counts.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("tok") - 1),
                lambda i: F.substring(F.col("tok"), i, F.lit(2)),
            )
        ).alias("pair"),
        "n",
    )
    got = {
        r["pair"]: r["n_occurrences"]
        for r in pairs.groupBy("pair").agg(F.sum("n").alias("n_occurrences")).collect()
    }
    assert got == {"ab": 3, "bc": 1}


def test_bpe_top_merge_is_global_argmax(spark):
    top = bpe_top_merge(spark, SF).collect()
    assert len(top) == 1
    counts = bpe_pair_counts(spark, SF)
    max_n = counts.agg(F.max("n_occurrences")).collect()[0][0]
    assert top[0]["n_occurrences"] == max_n


def _python_bpe(word_counts: dict[str, int], n_merges: int):
    """Independent reference BPE trainer (leftmost non-overlapping merge,
    tiebreak: count desc, left asc, right asc)."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), n_occ = best
        merges.append((rank, left, right, left + right, n_occ))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def test_new_family_plan_shapes(spark):
    """100 TB posture, checked in-plan: ER extracts equi-join keys from
    the blocking expressions (hash join, never a nested-loop all-pairs);
    the geo grid join broadcasts the replicated dim side; BPE pair counts
    are two partial-aggregated exchanges with no Python stage."""
    import io as _io
    from contextlib import redirect_stdout

    from ntd_gtfs_to_socrata_spark.queries.tokenizer_q import bpe_pair_counts as bpc

    def plan_text(df):
        buf = _io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    er_plan = plan_text(er_blocked_matches(spark, SF))
    assert "HashJoin" in er_plan  # Broadcast- or Shuffled-
    assert "NestedLoop" not in er_plan and "CartesianProduct" not in er_plan

    geo_plan = plan_text(geo_grid_neighbor_join(spark, SF))
    assert "BroadcastHashJoin" in geo_plan
    assert "CartesianProduct" not in geo_plan

    bpe_plan = plan_text(bpc(spark, SF))
    assert "partial_sum" in bpe_plan or "partial_count" in bpe_plan
    assert "BatchEvalPython" not in bpe_plan and "ArrowEvalPython" not in bpe_plan


def test_bpe_train_matches_python_reference(spark):
    import re
    from collections import Counter

    import duckdb

    from ntd_gtfs_to_socrata_spark.queries.tokenizer_q import bpe_train_merges

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    wc = Counter(
        t
        for txt in texts
        for t in re.split(r"\s+", txt.strip())
        if len(t) >= 2
    )
    expected = _python_bpe(dict(wc), 3)
    got = [
        (r["merge_rank"], r["left"], r["right"], r["merged"], r["n_occurrences"])
        for r in bpe_train_merges(spark, SF).orderBy("merge_rank").collect()
    ]
    assert got == expected


def test_bpe_token_counts_match_python_segmentation(spark):
    """Apply side: per-doc BPE sequence lengths equal an independent
    Python segmentation with the same learned merges."""
    import re
    from collections import Counter

    import duckdb

    from ntd_gtfs_to_socrata_spark.queries.tokenizer_q import bpe_token_counts

    rows = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    wc = Counter(
        t
        for _, txt in rows
        for t in re.split(r"\s+", txt.strip())
        if len(t) >= 2
    )
    merges = [(left, right) for _, left, right, _, _ in _python_bpe(dict(wc), 3)]

    def seg_len(tok: str) -> int:
        if len(tok) < 2:
            return 1
        syms = list(tok)
        for left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    expected = {}
    for doc_id, txt in rows:
        toks = [t for t in re.split(r"\s+", txt.strip()) if t]
        if toks:
            expected[doc_id] = (len(toks), sum(seg_len(t) for t in toks))

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(spark, SF).collect()
    }
    assert got == expected


def test_sampled_trainer_equals_distributed_on_full_vocab(spark, sf_dir):
    """With the sample cap above the fixture's full vocab size, the
    driver-side sampled trainer must produce EXACTLY the distributed
    trainer's merge table (same pair weighting, same leftmost
    non-overlapping fold, same tie-breaks) — the cross-check that makes
    the frequency cutoff the ONLY approximation at scale."""
    from ntd_gtfs_to_socrata_spark.queries.tokenizer_q import (
        train_bpe_merges,
        train_bpe_merges_sampled,
    )

    dist = [tuple(r) for r in train_bpe_merges(spark, sf_dir, n_merges=3).collect()]
    samp = [
        tuple(r)
        for r in train_bpe_merges_sampled(
            spark, sf_dir, n_merges=3, sample_vocab=10_000_000
        ).collect()
    ]
    assert dist == samp
    assert len(dist) == 3


def test_sampled_trainer_50_merges_runs_and_is_consistent(spark, sf_dir):
    """The 50-merge production path: ranks are dense, merge counts are
    non-increasing is NOT required (BPE counts can rise as symbols fuse),
    but every merge must be derivable: its pair count is positive and its
    merged symbol is left+right."""
    from ntd_gtfs_to_socrata_spark.queries.tokenizer_q import (
        train_bpe_merges_sampled,
    )

    rows = train_bpe_merges_sampled(spark, sf_dir, n_merges=50).collect()
    assert [r["merge_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) >= 10  # fixture corpus supports at least 10 merges
    for r in rows:
        assert r["merged"] == r["left"] + r["right"]
        assert r["n_occurrences"] > 0


def test_em_weights_match_pure_python_replay(spark, sf_dir):
    """The unrolled DataFrame EM against a from-scratch Python EM over
    the same pattern counts with the same micro-quantization — every
    parameter must agree exactly."""
    import math

    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.queries.entity_res import (
        _EM_FIELDS,
        _EM_INIT,
        _EM_ITERS,
        _dirty_customers,
        er_em_weights,
    )

    clean = load_table(spark, sf_dir, "customer")
    dirty = _dirty_customers(spark, sf_dir).join(
        load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("ck"),
            F.col("c_mktsegment").alias("mktsegment"),
        ),
        F.col("c_custkey") == F.col("ck"),
    ).drop("ck")
    from ntd_gtfs_to_socrata_spark.queries.entity_res import (
        _EM_PAIR_BUDGET,
        _em_bucket,
    )

    century = lambda bal: F.floor(bal / 100).cast("long")  # noqa: E731
    blocks = clean.groupBy(
        F.col("c_nationkey"), century(F.col("c_acctbal"))
    ).count()
    p_raw = blocks.agg(F.sum(F.col("count") * F.col("count"))).first()[0]
    import math as _math

    t = min(1_000_000, _math.floor(1e6 * _math.sqrt(_EM_PAIR_BUDGET / float(p_raw))))
    clean_s = clean.filter(_em_bucket(F.col("c_custkey")) < t)
    dirty_s = dirty.filter(_em_bucket(F.col("c_custkey") * 7919) < t)
    cand = clean_s.alias("a").join(
        dirty_s.alias("b"),
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.floor(F.col("a.c_acctbal") / 100).cast("long")
           == F.floor(F.col("b.c_acctbal") / 100).cast("long")),
    )
    counts = {
        (r["g_name"], r["g_bal"], r["g_seg"]): r["n"]
        for r in cand.select(
            (F.levenshtein(F.col("a.c_name"), F.col("b.name_dirty")) <= 1)
            .cast("int").alias("g_name"),
            (F.col("a.c_acctbal") == F.col("b.c_acctbal")).cast("int").alias("g_bal"),
            (F.col("a.c_mktsegment") == F.col("b.mktsegment")).cast("int").alias("g_seg"),
        ).groupBy("g_name", "g_bal", "g_seg").count()
        .withColumnRenamed("count", "n").collect()
    }

    lam = _EM_INIT["lam"]
    ps = {f: [_EM_INIT["m"], _EM_INIT["u"]] for f in _EM_FIELDS}
    for _ in range(_EM_ITERS):
        nm = nu = 0
        agree_m = {f: 0 for f in _EM_FIELDS}
        agree_u = {f: 0 for f in _EM_FIELDS}
        for g, n in counts.items():
            t_m, t_u = lam / 1e6, (1_000_000 - lam) / 1e6
            for k, f in enumerate(_EM_FIELDS):
                m, u = ps[f]
                t_m = t_m * ((m if g[k] else 1_000_000 - m) / 1e6)
                t_u = t_u * ((u if g[k] else 1_000_000 - u) / 1e6)
            w = math.floor(1e6 * t_m / (t_m + t_u))
            nm += n * w
            nu += n * (1_000_000 - w)
            for k, f in enumerate(_EM_FIELDS):
                if g[k]:
                    agree_m[f] += n * w
                    agree_u[f] += n * (1_000_000 - w)
        lam = math.floor(1e6 * (nm / float(nm + nu)))
        ps = {
            f: [
                math.floor(1e6 * (agree_m[f] / float(nm))),
                math.floor(1e6 * (agree_u[f] / float(nu))),
            ]
            for f in _EM_FIELDS
        }

    got = er_em_weights(spark, sf_dir).first().asDict()
    assert got["lam"] == lam
    for f in _EM_FIELDS:
        assert got[f"m_{f}"] == ps[f][0], f
        assert got[f"u_{f}"] == ps[f][1], f


def test_em_weights_learn_discriminative_parameters(spark, sf_dir):
    """EM must discover what the fixture encodes: name-agreement is the
    match signal (m_name >> u_name), and the match class is rare within
    blocks (lambda well below 50%)."""
    from ntd_gtfs_to_socrata_spark.queries.entity_res import er_em_weights

    p = er_em_weights(spark, sf_dir).first()
    assert p["m_name"] > 2 * p["u_name"]
    assert p["r_name"] > 1_000_000  # ratio > 1 in micro units
    # lambda reflects the fixture's blocked-candidate composition: at the
    # smoke SF the (nation, century) blocks are nearly singleton, so most
    # candidates ARE true matches — assert sanity, not rarity
    assert 0 < p["lam"] < 1_000_000
    # u-side of the exact-balance field stays small: chance balance
    # agreement among non-matches within a century block is rare
    assert p["u_bal"] < 200_000
