"""Hand-truth models for the r9 rank statistics, decay scoring, and soft
dedup weighting — semantic properties beyond the DuckDB oracle's value
hash (model equivalence, perfect-correlation limits, mass conservation)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.queries.dedup_text import dedup_soft_weight
from ntd_gtfs_to_socrata_spark.queries.stats_q import (
    _MW_SCALE,
    eval_mann_whitney,
    eval_spearman,
)
from ntd_gtfs_to_socrata_spark.queries.time_windows import (
    _DECAY_HORIZON,
    _DECAY_TOPK,
    tw_exp_decay_score,
)


def _avg_ranks_2x(values: list[int]) -> dict[int, int]:
    """value -> doubled tie-averaged rank (exact integer)."""
    cnt = Counter(values)
    out, cbefore = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * cbefore + cnt[v] + 1
        cbefore += cnt[v]
    return out


def test_mann_whitney_matches_python_model(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    ).select("event_type", "value").collect()
    a = [math.floor(r["value"] * _MW_SCALE) for r in ev if r["event_type"] == "purchase"]
    b = [math.floor(r["value"] * _MW_SCALE) for r in ev if r["event_type"] == "view"]
    r2 = _avg_ranks_2x(a + b)
    ta, tb = len(a), len(b)
    r2a = sum(r2[v] for v in a)
    u2 = r2a - ta * (ta + 1)
    n = ta + tb
    tie = sum(c**3 - c for c in Counter(a + b).values())
    sigma = math.sqrt(ta * tb / 12.0 * ((n + 1) - tie / (n * (n - 1.0))))
    z_micro = math.floor((u2 - ta * tb) / (2.0 * sigma) * 1000000 + 0.5)

    row = eval_mann_whitney(spark, sf_dir).collect()[0]
    assert (row["n_a"], row["n_b"]) == (ta, tb)
    assert row["u2"] == u2
    assert abs(row["z_micro"] - z_micro) <= 1  # model sums floats in a different order


def test_mann_whitney_identical_samples_z_zero(spark, sf_dir, tmp_path):
    # both cohorts drawn from the SAME values => U = ta*tb/2 exactly, z = 0
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value", "props")
    both = ev.withColumn("event_type", F.lit("purchase")).unionByName(
        ev.withColumn("event_type", F.lit("view"))
    )
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    both.write.mode("overwrite").parquet(str(d / "events.parquet"))
    row = eval_mann_whitney(spark, str(d)).collect()[0]
    assert row["n_a"] == row["n_b"]
    assert row["u2"] == row["n_a"] * row["n_b"]  # 2U = na*nb => U = na*nb/2
    assert row["z_micro"] == 0


def test_spearman_matches_python_model(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    xs = [len(r["text"]) for r in docs]
    ys = [len([t for t in r["text"].strip().split()]) for r in docs]
    rx, ry = _avg_ranks_2x(xs), _avg_ranks_2x(ys)
    n = len(xs)
    sx = sum(rx[v] for v in xs)
    sy = sum(ry[v] for v in ys)
    sxx = sum(rx[v] ** 2 for v in xs)
    syy = sum(ry[v] ** 2 for v in ys)
    sxy = sum(rx[a] * ry[b] for a, b in zip(xs, ys))
    rho = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * 1.0 * (n * syy - sy * sy))
    row = eval_spearman(spark, sf_dir).collect()[0]
    assert row["n_docs"] == n
    assert abs(row["rho_micro"] - math.floor(rho * 1000000 + 0.5)) <= 1
    # length and token count must correlate strongly on any text corpus
    assert row["rho_micro"] > 800000


def test_spearman_perfect_monotone_is_one(spark, tmp_path):
    # y strictly increases with x (all distinct) => rho == 1 exactly
    rows = [(i, "w " * (i + 1)) for i in range(50)]  # n_chars strictly grows
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    df.write.mode("overwrite").parquet(str(d / "documents.parquet"))
    row = eval_spearman(spark, str(d)).collect()[0]
    assert row["rho_micro"] == 1000000


def test_exp_decay_matches_python_model(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value").collect()
    t_end = max(r["ts"].date() for r in ev)
    scores: dict[int, int] = defaultdict(int)
    counts: dict[int, int] = defaultdict(int)
    for r in ev:
        age = (t_end - r["ts"].date()).days
        if age <= _DECAY_HORIZON:
            scores[r["user_id"]] += round(r["value"] * 100) * (1 << (_DECAY_HORIZON - age))
            counts[r["user_id"]] += 1
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_DECAY_TOPK]
    got = tw_exp_decay_score(spark, sf_dir).collect()
    assert [(r["user_id"], r["score_units"]) for r in got] == want
    assert all(r["n_recent"] == counts[r["user_id"]] for r in got)


def test_soft_weight_mass_conservation_and_singletons(spark, sf_dir):
    rows = dedup_soft_weight(spark, sf_dir).collect()
    assert len(rows) == load_table(spark, sf_dir, "documents").count()
    by_comp: dict[int, list] = defaultdict(list)
    for r in rows:
        by_comp[r["component_id"]].append(r)
    for comp, members in by_comp.items():
        k = members[0]["cluster_size"]
        assert len(members) == k
        # every member carries weight floor(1e6/k + .5); total cluster mass
        # is 1e6 up to k/2 micro of rounding
        assert all(r["weight_micro"] == math.floor(1e6 / k + 0.5) for r in members)
        assert abs(sum(r["weight_micro"] for r in members) - 1_000_000) <= k
    singles = [r for r in rows if r["cluster_size"] == 1]
    assert singles and all(r["weight_micro"] == 1_000_000 for r in singles)
    assert any(r["cluster_size"] > 1 for r in rows)  # fixture has near-dups


def test_mmr_matches_python_model(spark, sf_dir):
    """Replay the greedy MMR selection in pure Python from the same
    candidate pools and demand bit-identical picks and scores."""
    from ntd_gtfs_to_socrata_spark.queries.similarity_q import (
        _MMR_K,
        sim_mmr_diversify,
    )

    got = sim_mmr_diversify(spark, sf_dir).collect()
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos_micro(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) ** 2 for x in a))
        nb = math.sqrt(sum(float(x) ** 2 for x in b))
        return math.floor(round(num / (na * nb), 6) * 1000000 + 0.5)

    by_q = defaultdict(list)
    for r in got:
        by_q[r["qid"]].append(r)
    assert by_q and all(len(v) == _MMR_K for v in by_q.values())
    for qid, rows in by_q.items():
        rel = sorted(
            ((cos_micro(emb[qid], emb[c]), -c) for c in emb if c != qid),
            reverse=True,
        )[:20]
        pool = {-c: r for r, c in rel}
        sel, want = [], []
        for step in range(1, _MMR_K + 1):
            best = None
            for c, r in pool.items():
                if c in (s for s, _ in sel):
                    continue
                pen = max((cos_micro(emb[c], emb[s]) for s, _ in sel), default=0)
                sc = 7 * r - (3 * pen if sel else 0)
                if best is None or (sc, -c) > best[0]:
                    best = ((sc, -c), c)
            sel.append((best[1], best[0][0]))
            want.append((best[1], step, best[0][0]))
        got_q = sorted(((r["cid"], r["step"], r["score10"]) for r in rows),
                       key=lambda t: t[1])
        assert got_q == want, f"qid={qid}"


def test_mmr_diversifies_at_least_one_query(spark, sf_dir):
    """MMR must disagree with pure relevance ranking somewhere (the
    fixture embeddings contain near-dup directions), and step scores
    must be non-increasing per query past step 1."""
    from ntd_gtfs_to_socrata_spark.queries.similarity_q import sim_mmr_diversify
    from ntd_gtfs_to_socrata_spark.queries.similarity_q import sim_bruteforce

    got = sim_mmr_diversify(spark, sf_dir).collect()
    brute = sim_bruteforce(spark, sf_dir).collect()
    top5 = defaultdict(set)
    for r in brute:
        if r["rnk"] <= 5:
            top5[r["qid"]].add(r["cid"])
    mmr5 = defaultdict(set)
    for r in got:
        mmr5[r["qid"]].add(r["cid"])
    assert set(top5) == set(mmr5)
    assert any(top5[q] != mmr5[q] for q in top5)


def test_mcnemar_consistent_with_kappa_contingency(spark, sf_dir):
    """McNemar's discordant cells must equal kappa's n10/n01 (same raters,
    same join), and the continuity-corrected statistic must replay in
    Python exactly."""
    from ntd_gtfs_to_socrata_spark.queries.stats_q import (
        eval_cohen_kappa,
        eval_mcnemar,
    )

    k = eval_cohen_kappa(spark, sf_dir).collect()[0]
    m = eval_mcnemar(spark, sf_dir).collect()[0]
    assert (m["n10"], m["n01"]) == (k["n10"], k["n01"])
    b, c = m["n10"], m["n01"]
    want = 0 if b + c == 0 else math.floor((abs(b - c) - 1) ** 2 / (b + c) * 1e6 + 0.5)
    assert m["chi2_micro"] == want


def test_retention_cohorts_match_python_model(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.time_windows import tw_retention_cohorts

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    def week(ts):
        d = ts.date()
        return d - __import__("datetime").timedelta(days=d.weekday())
    first = {}
    active = set()
    for r in ev:
        w = week(r["ts"])
        u = r["user_id"]
        first[u] = min(first.get(u, w), w)
        active.add((u, w))
    sizes = Counter(first.values())
    cells = Counter(
        (first[u], (w - first[u]).days // 7) for u, w in active
    )
    got = tw_retention_cohorts(spark, sf_dir).collect()
    assert len(got) == len(cells)
    for r in got:
        import datetime
        cw = datetime.datetime.fromtimestamp(
            r["cohort_week"], datetime.timezone.utc
        ).date()
        n = cells[(cw, r["week_offset"])]
        assert r["n_active"] == n
        assert r["cohort_size"] == sizes[cw]
        assert r["retention_micro"] == math.floor(n * 1e6 / sizes[cw] + 0.5)
        if r["week_offset"] == 0:
            # every user is active in their own cohort week
            assert r["retention_micro"] == 1_000_000
