"""Semantic checks for HITS, common-neighbor link prediction, the bigram
LM score, and the bit-exact EWMA — hand-computed tiny-graph/series truths
the DuckDB value-hash can't express (exact integer propagation, missing-
link identification, order sensitivity, float exactness)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators.graph import hits


def test_hits_star_graph_exact_integers(spark):
    # 3 hubs all pointing at one authority t, plus t -> x so t has an
    # out-edge too. h0 = 1 everywhere.
    edges = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (9, 4)], ["src", "dst"]
    )
    rows = {r["node"]: r for r in hits(edges, iterations=2).collect()}
    # iteration 1: a1 = in-degree: a1(9)=3, a1(4)=1, others 0
    #              h1(n) = sum a1 over out-neighbors: h1(1..3)=3, h1(9)=1
    # iteration 2: a2(9) = h1(1)+h1(2)+h1(3) = 9; a2(4) = h1(9) = 1
    #              h2(1..3) = a2(9) = 9; h2(9) = a2(4) = 1
    assert rows[9]["auth_raw"] == 9 and rows[9]["hub_raw"] == 1
    assert rows[4]["auth_raw"] == 1 and rows[4]["hub_raw"] == 0
    for n in (1, 2, 3):
        assert rows[n]["auth_raw"] == 0 and rows[n]["hub_raw"] == 9


def test_hits_scores_are_exact_longs(spark):
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
    df = hits(edges, iterations=3)
    dtypes = dict(df.dtypes)
    assert dtypes["auth_raw"] == "bigint" and dtypes["hub_raw"] == "bigint"
    # 3-cycle is symmetric under rotation: all scores equal
    rows = df.collect()
    assert len({r["auth_raw"] for r in rows}) == 1
    assert len({r["hub_raw"] for r in rows}) == 1


def test_link_prediction_finds_missing_triangle_edge(spark, sf_dir):
    """Path a-b-c in the cosine graph ⇒ (a,c) must appear as a candidate;
    conversely no returned pair may already be an edge."""
    from ntd_gtfs_to_socrata_spark.queries.graph_q import graph_link_prediction
    from ntd_gtfs_to_socrata_spark.queries.similarity_q import sim_neardup_pairs

    edges = {
        (r["id_a"], r["id_b"])
        for r in sim_neardup_pairs(spark, sf_dir).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    preds = graph_link_prediction(spark, sf_dir).collect()
    assert preds, "cosine graph at this sf has open wedges"
    for r in preds:
        pair = (r["id_a"], r["id_b"])
        assert pair not in edges, "predicted an existing edge"
        inter = len(adj[r["id_a"]] & adj[r["id_b"]])
        union = len(adj[r["id_a"]] | adj[r["id_b"]])
        assert r["common_neighbors"] == inter
        expected = math.floor(inter / union * 1e6 + 0.5) / 1e6
        assert r["score"] == expected


def test_bigram_logprob_penalizes_shuffled_word_salad(spark):
    """Docs reusing frequent tokens in improbable ORDER must score lower
    than the coherent docs a unigram model can't tell apart."""
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import text_bigram_logprob

    coherent = "the cat sat on the mat"
    rows = [(i, coherent) for i in range(10)]
    rows.append((99, "mat the on sat cat the"))  # same tokens, salad order
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    import unittest.mock as mock

    with mock.patch(
        "ntd_gtfs_to_socrata_spark.queries.dedup_text.load_table",
        return_value=docs,
    ):
        out = {r["doc_id"]: r for r in text_bigram_logprob(spark, "unused").collect()}
    assert out[99]["avg_logprob"] < out[0]["avg_logprob"]
    assert out[0]["n_bigrams"] == 5


def test_ewma_hand_computed_and_bit_exact(spark, sf_dir):
    from ntd_gtfs_to_socrata_spark.queries.time_windows import (
        _EWMA_SPAN,
        tw_ewma_smoothed,
    )
    from ntd_gtfs_to_socrata_spark.io import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    expected = {}
    for u, rows in by_user.items():
        rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        for i, r in enumerate(rows):
            window = rows[max(0, i - (_EWMA_SPAN - 1)) : i + 1]
            s = len(window)
            num = 0.0
            for j, wr in enumerate(window):
                num += wr["value"] * 2.0 ** -(s - 1 - j)
            expected[(u, r["event_id"])] = num / (2.0 - 2.0 ** -(s - 1))
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in tw_ewma_smoothed(spark, sf_dir).collect()
    }
    assert got.keys() == expected.keys()
    for k, v in expected.items():
        # bit-exact: same fold order, power-of-two weights
        assert got[k] == v, k


def test_resample_interpolate_hand_computed(spark):
    """3 observations at 00:30, 02:30, 03:00 -> grid hours 01:00, 02:00,
    03:00: two interpolated points on the first segment, one exact hit."""
    import unittest.mock as mock

    from pyspark.sql import Row
    from ntd_gtfs_to_socrata_spark.queries import time_windows as TWm

    h = 3_600_000_000  # us
    base = 1_700_000_400_000_000  # not hour-aligned; obs at +0, +2h, +2.5h
    # align manually: choose obs ts so grid math is easy
    t0 = 1_700_002_800_000_000  # some instant; grid = ceil to hour
    import datetime as dt

    def ts(us):
        return dt.datetime.fromtimestamp(us / 1e6, dt.timezone.utc).replace(
            tzinfo=None
        )

    # obs at 00:30 (v=10), 02:30 (v=50), 03:00 exactly (v=80)
    o1 = (1_700_001_000 // 3600 + 1) * 3600 * 1_000_000 - 30 * 60 * 1_000_000
    g1 = o1 + 30 * 60 * 1_000_000          # first grid hour after o1
    o2 = o1 + 2 * 3600 * 1_000_000          # 02:30
    o3 = g1 + 2 * 3600 * 1_000_000          # 03:00 == grid point
    rows = [
        Row(event_id=1, ts=ts(o1), user_id=7, event_type="purchase", value=10.0),
        Row(event_id=2, ts=ts(o2), user_id=7, event_type="purchase", value=50.0),
        Row(event_id=3, ts=ts(o3), user_id=7, event_type="purchase", value=80.0),
    ]
    docs = spark.createDataFrame(rows)
    with mock.patch.object(TWm, "load_table", return_value=docs):
        out = {
            r["grid_epoch"]: r["value_micro"]
            for r in TWm.tw_resample_interpolate(spark, "unused").collect()
        }
    ge1 = g1 // 1_000_000
    # segment o1->o2 spans 2h, slope (50-10)/2h: 01:00 -> 10 + 40*(0.5/2) = 20
    assert out[ge1] == 20_000_000
    # 02:00 -> 10 + 40*(1.5/2) = 40
    assert out[ge1 + 3600] == 40_000_000
    # 03:00 is an exact observation hit -> 80
    assert out[ge1 + 7200] == 80_000_000
    assert len(out) == 3


def test_bfs_distances_path_graph(spark):
    """Path 1-2-3-4-5-6 with seed {1}: dist = hops, capped at max_hops;
    node 6 unreached at max_hops=4. Second seed {5} shows the multi-source
    min."""
    from ntd_gtfs_to_socrata_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["doc_id"])
    got = {r["node"]: r["dist"] for r in bfs_distances(edges, seeds, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}
    seeds2 = spark.createDataFrame([(1,), (5,)], ["doc_id"])
    got2 = {
        r["node"]: r["dist"] for r in bfs_distances(edges, seeds2, max_hops=4).collect()
    }
    assert got2 == {1: 0, 2: 1, 3: 2, 4: 1, 5: 0, 6: 1}


def test_modularity_python_recompute(spark, sf_dir):
    """Recompute per-community modularity contributions in pure Python
    from the query's own inputs (pairs + LPA labels) and compare exactly."""
    import math

    from ntd_gtfs_to_socrata_spark.operators.graph import label_propagation
    from ntd_gtfs_to_socrata_spark.queries.dedup_text import _ngram_jaccard
    from ntd_gtfs_to_socrata_spark.queries.graph_q import (
        _LPA_ITERS,
        AUDIT_DF_CAP,
        graph_modularity,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
        .select("doc_a", "doc_b")
        .collect()
    ]
    edges = spark.createDataFrame(pairs, ["doc_a", "doc_b"]).selectExpr(
        "doc_a AS src", "doc_b AS dst"
    )
    sym = edges.selectExpr("src", "dst").unionByName(
        edges.selectExpr("dst AS src", "src AS dst")
    ).distinct()
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(sym, iterations=_LPA_ITERS).collect()
    }
    m = len(pairs)
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    e_c: dict[int, int] = {}
    d_c: dict[int, int] = {}
    n_c: dict[int, int] = {}
    for node, lab in labels.items():
        d_c[lab] = d_c.get(lab, 0) + deg[node]
        n_c[lab] = n_c.get(lab, 0) + 1
    for a, b in pairs:
        if labels[a] == labels[b]:
            e_c[labels[a]] = e_c.get(labels[a], 0) + 1
    got = {r["community"]: r for r in graph_modularity(spark, sf_dir).collect()}
    assert set(got) == set(n_c)
    for lab, r in got.items():
        assert r["n_members"] == n_c[lab]
        assert r["internal_edges"] == e_c.get(lab, 0)
        assert r["degree_sum"] == d_c[lab]
        half = d_c[lab] / (2.0 * m)
        want = math.floor((e_c.get(lab, 0) / m - half * half) * 1e6 + 0.5)
        assert r["modularity_contrib_micro"] == want


def test_range_frame_hand_computed(spark, sf_dir):
    """Brute-force the trailing 30-minute frame per purchase in Python
    and compare the micro-quantized sums exactly."""
    import math

    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.queries.time_windows import (
        _RANGE_SEC,
        tw_range_frame_sum,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", F.unix_micros("ts").alias("tus"), "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    want = {}
    for u, rows in by_user.items():
        for r in rows:
            tsec = r["tus"] // 1_000_000
            frame = [
                o
                for o in rows
                if tsec - _RANGE_SEC <= o["tus"] // 1_000_000 <= tsec
            ]
            s = sum(math.floor(o["value"] * 1e6 + 0.5) for o in frame)
            want[(u, r["event_id"])] = (s, len(frame))
    got = {
        (r["user_id"], r["event_id"]): (r["sum_value_micro"], r["n_in_window"])
        for r in tw_range_frame_sum(spark, sf_dir).collect()
    }
    assert got == want


def test_nearest_asof_hand_truth(spark):
    """Views at -40min, -10min, +5min of a click: nearest is +5min
    (forward); a second click with equidistant views prefers backward."""
    import datetime as dt
    import unittest.mock as mock

    from pyspark.sql import Row
    from ntd_gtfs_to_socrata_spark.queries import time_windows as TWm

    def ts(sec):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)

    rows = [
        Row(event_id=1, ts=ts(0), user_id=1, event_type="view", value=0.0),
        Row(event_id=2, ts=ts(1800), user_id=1, event_type="view", value=0.0),
        Row(event_id=3, ts=ts(2400), user_id=1, event_type="click", value=0.0),
        Row(event_id=4, ts=ts(2700), user_id=1, event_type="view", value=0.0),
        # user 2: click equidistant (600s) between two views -> backward
        Row(event_id=5, ts=ts(0), user_id=2, event_type="view", value=0.0),
        Row(event_id=6, ts=ts(600), user_id=2, event_type="click", value=0.0),
        Row(event_id=7, ts=ts(1200), user_id=2, event_type="view", value=0.0),
        # user 3: no view within tolerance -> nulls
        Row(event_id=8, ts=ts(0), user_id=3, event_type="view", value=0.0),
        Row(event_id=9, ts=ts(7200), user_id=3, event_type="click", value=0.0),
    ]
    docs = spark.createDataFrame(rows)
    with mock.patch.object(TWm, "load_table", return_value=docs):
        out = {r["click_id"]: r for r in TWm.asof_join_nearest(spark, "x").collect()}
    assert out[3]["view_id"] == 4 and out[3]["delta_us"] == -300 * 1_000_000
    assert out[6]["view_id"] == 5 and out[6]["delta_us"] == 600 * 1_000_000
    assert out[9]["view_id"] is None and out[9]["delta_us"] is None


def test_assortativity_python_recompute(spark, sf_dir):
    """Recompute Newman's r from the pair list in pure Python and compare
    the quantized value; a star graph must be strongly negative."""
    import math

    from ntd_gtfs_to_socrata_spark.queries.dedup_text import _ngram_jaccard
    from ntd_gtfs_to_socrata_spark.queries.graph_q import (
        AUDIT_DF_CAP,
        graph_assortativity,
    )

    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
        .select("doc_a", "doc_b")
        .collect()
    ]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = []
    for a, b in pairs:
        xs.append((deg[a], deg[b]))
        xs.append((deg[b], deg[a]))
    m2 = len(xs)
    sxy = sum(x * y for x, y in xs)
    sx = sum(x + y for x, y in xs)
    sxx = sum(x * x + y * y for x, y in xs)
    denom = 2 * m2 * sxx - sx * sx
    want = (
        0
        if denom == 0
        else math.floor(float(4 * m2 * sxy - sx * sx) / float(denom) * 1e6 + 0.5)
    )
    r = graph_assortativity(spark, sf_dir).collect()[0]
    assert r["n_edges"] == len(pairs)
    assert r["assortativity_micro"] == want


def test_mutual_information_python_recompute(spark, sf_dir):
    """Recompute MI/NMI micro-units from pandas counts with identical
    quantization and compare exactly; MI of independent-ish columns must
    sit far below min-entropy (NMI << 1)."""
    import math
    from collections import Counter

    import pandas as pd

    from ntd_gtfs_to_socrata_spark.queries.dedup_text import dq_mutual_information

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "source"])
    n = len(docs)
    cell = Counter(zip(docs["lang"], docs["source"]))
    ra = Counter(docs["lang"])
    cb = Counter(docs["source"])
    mi_sum = sum(
        int(math.floor(c * math.log(c * n / (ra[l] * cb[s])) * 1e6 + 0.5))
        for (l, s), c in cell.items()
    )
    hx = sum(int(math.floor(-a * math.log(a / n) * 1e6 + 0.5)) for a in ra.values())
    hy = sum(int(math.floor(-b * math.log(b / n) * 1e6 + 0.5)) for b in cb.values())
    r = dq_mutual_information(spark, sf_dir).collect()[0]
    assert r["n_rows"] == n
    assert r["mi_sum_micro"] == mi_sum
    assert r["mi_micro"] == int(math.floor(mi_sum / n + 0.5))
    assert r["nmi_micro"] == int(math.floor(mi_sum / min(hx, hy) * 1e6 + 0.5))
    assert 0 <= r["nmi_micro"] < 1_000_000


def test_cusum_hand_computed(spark, sf_dir):
    """Replay the integer CUSUM recursion in Python from the daily counts
    and compare every row exactly."""
    import math

    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.queries.time_windows import (
        _CUSUM_SLACK_MICRO,
        tw_cusum_drift,
    )

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").cast("string").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["n"]))
    want = {}
    for et, rows in series.items():
        rows.sort()
        mu = int(
            math.floor(sum(n for _, n in rows) / len(rows) * 1e6 + 0.5)
        )
        s = 0
        for day, n in rows:
            s = max(0, s + n * 1_000_000 - mu - _CUSUM_SLACK_MICRO)
            want[(et, day)] = (n, s)
    got = {
        (r["event_type"], r["day"]): (r["n"], r["cusum_micro"])
        for r in tw_cusum_drift(spark, sf_dir).collect()
    }
    assert got == want


def test_hits_rejects_nonpositive_iterations(spark):
    """iterations=0 must raise ValueError, not a TypeError from joining
    None (advisor r8)."""
    import pytest

    from ntd_gtfs_to_socrata_spark.operators.graph import hits

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        hits(edges, iterations=0)


def test_ewma_state_tail_bounded_for_span_one():
    """span=1 carries EMPTY state; tail[-0:] would carry the full history
    (advisor r8). span>=2 keeps exactly span-1 values."""
    from ntd_gtfs_to_socrata_spark.streaming.stateful import _trim_tail

    assert _trim_tail([1.0, 2.0, 3.0], 1) == []
    assert _trim_tail([], 1) == []
    assert _trim_tail([1.0, 2.0, 3.0], 2) == [3.0]
    assert _trim_tail([1.0, 2.0, 3.0], 3) == [2.0, 3.0]
    assert _trim_tail([1.0], 16) == [1.0]
    # the negative-wrap trap: len(tail) strictly between (span-1)/2 and
    # span-1 is where tail[len(tail)-(span-1):] silently drops elements
    eight = [float(i) for i in range(8)]
    assert _trim_tail(eight, 16) == eight
    assert _trim_tail([float(i) for i in range(20)], 16) == [
        float(i) for i in range(5, 20)
    ]


def test_funnel_ordering_semantics_hand_truth(spark):
    """Funnel stages require the NEXT stage strictly AFTER the previous
    anchor and within the window: same-timestamp events do not convert,
    out-of-order purchases do not convert, in-window ordered ones do."""
    import datetime as dt

    from ntd_gtfs_to_socrata_spark.queries.time_windows import (
        _FUNNEL_WINDOW_US,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ev(uid, typ, sec):
        return (uid, typ, t0 + dt.timedelta(seconds=sec))

    rows = [
        # user 1: full ordered funnel inside the window
        ev(1, "view", 0), ev(1, "click", 10), ev(1, "purchase", 20),
        # user 2: click BEFORE view -> stops at stage 1
        ev(2, "click", 0), ev(2, "view", 10),
        # user 3: click at the SAME instant as view -> not strictly after
        ev(3, "view", 0), ev(3, "click", 0),
        # user 4: click outside the 7-day window
        ev(4, "view", 0), ev(4, "click", _FUNNEL_WINDOW_US // 1_000_000 + 1),
        # user 5: view+click, purchase before click -> stage 2 only
        ev(5, "purchase", 5), ev(5, "view", 10), ev(5, "click", 20),
    ]
    import tempfile

    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.queries.time_windows import tw_funnel_stages

    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    work = tempfile.mkdtemp(prefix="funnel_fixture_")
    # write a minimal events fixture dir the query can load
    df.select(
        F.monotonically_increasing_id().alias("event_id"),
        "ts",
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    ).write.parquet(work + "/events.parquet")
    got = {r["stage"]: r["n_users"] for r in tw_funnel_stages(spark, work).collect()}
    # stage 1: users 1,3,4,5 have a view... user 2 also views (at sec 10)
    assert got[1] == 5
    # stage 2: user 1 (click after view), user 5 (click 20 > view 10);
    # NOT user 2 (no click after view), 3 (same instant), 4 (outside window)
    assert got[2] == 2
    # stage 3: only user 1 (user 5's purchase precedes its click)
    assert got[3] == 1
