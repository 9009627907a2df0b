"""Independent parity check for eval_bradley_terry: a pure-Python MM with
the same micro-unit quantization, fed from the raw parquet via pandas, must
reproduce the distributed result exactly — plus the semantic invariants
(winless -> 0, dominance ordering) the value hash can't articulate."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd

from ntd_gtfs_to_socrata_spark.queries.stats_q import (
    _BT_ITERS,
    eval_bradley_terry,
)

MICRO = 1_000_000.0


def _python_bt(sf_dir: str) -> dict[int, tuple[int, int, int]]:
    li = pd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice"],
    )
    pairs: dict[tuple[int, int], list[int]] = defaultdict(lambda: [0, 0])
    for _, grp in li.groupby("l_orderkey"):
        rows = sorted(
            zip(grp["l_suppkey"], grp["l_extendedprice"]), key=lambda r: r[0]
        )
        for x in range(len(rows)):
            for y in range(x + 1, len(rows)):
                (si, pi), (sj, pj) = rows[x], rows[y]
                if si == sj:
                    continue
                i, j = (si, sj) if si < sj else (sj, si)
                win_i = pi > pj or (pi == pj)  # tie -> lower suppkey (= i)
                if si > sj:
                    win_i = pj > pi or (pj == pi)
                rec = pairs[(i, j)]
                rec[0] += 1
                rec[1] += 1 if win_i else 0
    games: dict[int, list[tuple[int, int, int]]] = defaultdict(list)
    for (i, j), (n, w) in pairs.items():
        games[i].append((j, n, w))
        games[j].append((i, n, n - w))
    wins = {p: sum(w for _, _, w in gs) for p, gs in games.items()}
    total = {p: sum(n for _, n, _ in gs) for p, gs in games.items()}
    su = {p: 1_000_000 for p in games}
    for _ in range(_BT_ITERS):
        new = {}
        for p, gs in games.items():
            d = sum(
                int(math.floor(float(n) / ((su[p] + su[o]) / MICRO) * MICRO + 0.5))
                for o, n, _ in gs
            )
            if wins[p] == 0 or d == 0:
                new[p] = 0
            else:
                new[p] = int(
                    math.floor(float(wins[p]) / (float(d) / MICRO) * MICRO + 0.5)
                )
        su = new
    return {p: (total[p], wins[p], su[p]) for p in games}


def test_bradley_terry_matches_pure_python(spark, sf_dir):
    got = {
        r["supp_key"]: (r["n_games"], r["n_wins"], r["strength_micro"])
        for r in eval_bradley_terry(spark, sf_dir).collect()
    }
    want = _python_bt(sf_dir)
    assert got == want


def test_bradley_terry_semantics(spark, sf_dir):
    rows = eval_bradley_terry(spark, sf_dir).collect()
    assert rows
    by_rate = sorted(rows, key=lambda r: r["n_wins"] / r["n_games"])
    # winless entities (if any) pin to exactly 0; everyone else positive
    for r in rows:
        if r["n_wins"] == 0:
            assert r["strength_micro"] == 0
        else:
            assert r["strength_micro"] > 0
    # strength broadly tracks win rate: the best-rate entity must outrank
    # the worst-rate one (a weak but model-independent dominance check)
    assert (
        by_rate[-1]["strength_micro"] >= by_rate[0]["strength_micro"]
    )


def test_cohen_kappa_hand_computed(spark, sf_dir):
    """Recompute kappa from the query's own contingency counts in pure
    Python (independent arithmetic path) and check the quantized value;
    also pin the counts to the two source verdict queries."""
    import math

    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        text_gopher_rules,
        text_quality_classifier,
    )
    from ntd_gtfs_to_socrata_spark.queries.stats_q import eval_cohen_kappa

    r = eval_cohen_kappa(spark, sf_dir).collect()[0]
    ka = {
        x["doc_id"]: x["keep"]
        for x in text_quality_classifier(spark, sf_dir).collect()
    }
    kb = {
        x["doc_id"]: x["keep"] for x in text_gopher_rules(spark, sf_dir).collect()
    }
    n11 = sum(1 for d in ka if ka[d] and kb[d])
    n10 = sum(1 for d in ka if ka[d] and not kb[d])
    n01 = sum(1 for d in ka if not ka[d] and kb[d])
    n00 = sum(1 for d in ka if not ka[d] and not kb[d])
    n = len(ka)
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    if pe_num == n * n:
        want = 0
    else:
        want = int(
            math.floor(
                (float(n * (n11 + n00)) - float(pe_num))
                / (float(n * n) - float(pe_num))
                * 1e6
                + 0.5
            )
        )
    assert r["kappa_micro"] == want


def test_t_closeness_python_recompute(spark, sf_dir):
    """Recompute the variational-distance audit in pure Python from the
    raw parquet and compare all four counters exactly."""
    import math
    from collections import Counter

    import pandas as pd

    from ntd_gtfs_to_socrata_spark.queries.privacy_q import (
        _T_MICRO,
        privacy_t_closeness,
    )

    cust = pd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    cust["band"] = (cust["c_acctbal"] / 1000).apply(math.floor)
    n = len(cust)
    gv = Counter(cust["c_mktsegment"])
    groups: dict[tuple, Counter] = {}
    for _, r in cust.iterrows():
        groups.setdefault((r["c_nationkey"], r["band"]), Counter())[
            r["c_mktsegment"]
        ] += 1
    n_groups = len(groups)
    max_t = 0
    n_over = 0
    rows_at_risk = 0
    for key, cnt in groups.items():
        s = sum(cnt.values())
        present_num = sum(abs(nv * n - gv[v] * s) for v, nv in cnt.items())
        present_big = sum(gv[v] for v in cnt)
        t_micro = int(
            math.floor(
                (float(present_num) + float(n - present_big) * float(s))
                / (2.0 * float(s) * float(n))
                * 1e6
                + 0.5
            )
        )
        max_t = max(max_t, t_micro)
        if t_micro > _T_MICRO:
            n_over += 1
            rows_at_risk += s
    r = privacy_t_closeness(spark, sf_dir).collect()[0]
    assert (r["n_groups"], r["max_t_micro"], r["n_over_t"], r["rows_at_risk"]) == (
        n_groups,
        max_t,
        n_over,
        rows_at_risk,
    )


def test_pass_at_k_matches_exact_combinatorics(spark, sf_dir):
    """The product form must equal the exact 1 - C(n-c,k)/C(n,k) from
    Python's arbitrary-precision comb(), quantized the same way."""
    import math

    from ntd_gtfs_to_socrata_spark.queries.stats_q import _PAK_K, eval_pass_at_k

    rows = eval_pass_at_k(spark, sf_dir).collect()
    assert rows
    for r in rows:
        n, c = r["n"], r["c"]
        assert n >= _PAK_K
        if n - c < _PAK_K:
            assert r["pass_at_k_micro"] == 1_000_000
            continue
        # float-product replay (the engines' arithmetic)
        prod = 1.0
        for i in range(_PAK_K):
            prod *= float(n - c - i) / float(n - i)
        want = math.floor((1.0 - prod) * 1e6 + 0.5)
        assert r["pass_at_k_micro"] == want
        # and the float form agrees with exact combinatorics to 1 micro
        exact = 1 - math.comb(n - c, _PAK_K) / math.comb(n, _PAK_K)
        assert abs(r["pass_at_k_micro"] / 1e6 - exact) <= 2e-6
