"""Unit tests for the round-6 operators: Bloom-prefiltered anti-join,
fixed-iteration PageRank, and the Z-order (Morton) layout key."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators.bloom import (
    bloom_anti_join,
    build_bloom,
    might_contain,
)
from ntd_gtfs_to_socrata_spark.operators.graph import pagerank
from ntd_gtfs_to_socrata_spark.queries.layout_q import zorder_key

# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    """Every inserted key must probe positive — the property the exact
    anti-join equivalence rests on."""
    keys = spark.range(0, 2000).select((F.col("id") * 7 + 3).alias("k"))
    words = build_bloom(keys, "k")
    hits = keys.filter(might_contain(words, F.col("k"))).count()
    assert hits == 2000


def test_bloom_prefilter_actually_prunes(spark):
    """Disjoint probe keys should be mostly rejected map-side (the bloom
    is 65 536 bits for 2 000 keys, so the false-positive rate is tiny)."""
    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k")
    probe = spark.range(1_000_000, 1_010_000).select(F.col("id").alias("k"))
    passed = probe.filter(might_contain(words, F.col("k"))).count()
    assert passed < 100  # fp rate well under 1%


def test_bloom_anti_join_equals_plain_anti_join(spark):
    rng = random.Random(42)
    probe_vals = [rng.randrange(0, 5000) for _ in range(4000)]
    key_vals = [rng.randrange(0, 5000) for _ in range(1500)]
    probe = spark.createDataFrame([(v,) for v in probe_vals], ["pk"])
    keys = spark.createDataFrame([(v,) for v in key_vals], ["kk"])
    got = sorted(
        r["pk"]
        for r in bloom_anti_join(probe, keys, "pk", "kk").collect()
    )
    want = sorted(
        r["pk"]
        for r in probe.join(keys, probe.pk == keys.kk, "left_anti").collect()
    )
    assert got == want


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _pagerank_serial(edges, iterations=5, damping=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    eset = sorted(set(edges))
    outdeg = {}
    for u, _ in eset:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {n: 1.0 for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0.0 for n in nodes}
        for u, v in eset:
            incoming[v] += rank[u] / outdeg[u]
        rank = {n: (1 - damping) + damping * incoming[n] for n in nodes}
    return rank


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3)],  # path: dangling tail, source head
        [(1, 2), (2, 1), (2, 3), (3, 1)],  # cycle with a chord
        [(1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 1)],  # star hub
    ],
)
def test_pagerank_matches_serial_reference(spark, edges):
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=5).collect()}
    want = _pagerank_serial(edges, iterations=5)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-9)


def test_pagerank_source_node_settles_at_one_minus_damping(spark):
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    assert got[1] == pytest.approx(0.15)


# ---------------------------------------------------------------------------
# Z-order key
# ---------------------------------------------------------------------------


def _morton_serial(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_serial_interleave(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(0, 65536), rng.randrange(0, 65536)) for _ in range(200)]
    pts += [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (3, 1)]
    df = spark.createDataFrame(pts, ["x", "y"])
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == _morton_serial(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_locality_beats_single_column_sort(spark):
    """The layout claim itself: tile by z-order top bits vs tile by x-only
    top bits, compare the Y-extent of the resulting tiles. Z-order tiles
    must bound BOTH dimensions (y-extent ~ a quadrant), while x-sorted
    tiles leave y unbounded (~ the full domain)."""
    rng = random.Random(11)
    pts = [(rng.randrange(0, 65536), rng.randrange(0, 65536)) for _ in range(5000)]
    df = spark.createDataFrame(pts, ["x", "y"])
    z_tiles = (
        df.select(
            "y",
            F.shiftright(zorder_key(F.col("x"), F.col("y")), 26).alias("tile"),
        )
        .groupBy("tile")
        .agg((F.max("y") - F.min("y")).alias("ext"))
        .agg(F.avg("ext"))
        .collect()[0][0]
    )
    x_tiles = (
        df.select("y", F.shiftright(F.col("x"), 13).alias("tile"))
        .groupBy("tile")
        .agg((F.max("y") - F.min("y")).alias("ext"))
        .agg(F.avg("ext"))
        .collect()[0][0]
    )
    # z tiles bound y to ~1/8 of the domain; x tiles span ~all of it
    assert z_tiles < x_tiles / 4


def test_label_propagation_splits_bridged_cliques(spark):
    """Two 4-cliques joined by a single bridge edge: connected components
    merges them into one component, but majority-vote label propagation
    keeps two communities (the bridge is outvoted by each side's clique
    neighbors)."""
    from ntd_gtfs_to_socrata_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    clique_a = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique_b = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10)]
    pairs = clique_a + clique_b + bridge
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "src long, dst long"
    )

    cc = connected_components(edges)
    assert cc.select("component_id").distinct().count() == 1

    labels = label_propagation(edges, iterations=3)
    communities = {
        r["label"] for r in labels.select("label").distinct().collect()
    }
    assert len(communities) == 2
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert len({got[n] for n in range(4)}) == 1
    assert len({got[n] for n in range(10, 14)}) == 1
    assert got[0] != got[10]


def test_k_core_peels_chains_keeps_cliques(spark):
    from ntd_gtfs_to_socrata_spark.operators.graph import k_core

    # triangle {1,2,3} + a tail 3-4-5: the 2-core is exactly the triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r["node"]: r["core_degree"] for r in k_core(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_of_pure_path_is_empty(spark):
    from ntd_gtfs_to_socrata_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    assert k_core(edges, k=2).count() == 0


def test_k_core_long_chain_converges_with_derived_bound(spark):
    """r6 ADVICE: k=2 peeling on a simple path removes only the two
    endpoints per round, so an 80-node chain needs ~40 rounds — beyond
    the old fixed default of 30. The node-count-derived default bound
    must peel it to the (empty) fixpoint without raising."""
    from ntd_gtfs_to_socrata_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(80)], "src long, dst long"
    ).coalesce(2)
    assert k_core(edges, k=2).count() == 0


def test_k_core_explicit_bound_raises_on_exhaustion(spark):
    """An explicit round budget smaller than the chain needs must RAISE
    (partial peel is a wrong k-core, never returned) — the contract
    graph_k_core leans on to stay in lockstep with its fixed-unroll
    oracle."""
    import pytest

    from ntd_gtfs_to_socrata_spark.operators.graph import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(80)], "src long, dst long"
    ).coalesce(2)
    with pytest.raises(RuntimeError, match="caller-imposed bound"):
        k_core(edges, k=2, max_iterations=3).collect()
