"""Dedup/text invariants beyond the oracle hash-match: jaccard symmetry
bounds, simhash determinism, shingle edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.operators import textops as TX
from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
    dedup_minhash,
    dedup_ngram_jaccard,
    dedup_simhash,
)


def test_shingles_edge_cases(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("",), ("x y z",)], "text string"
    )
    got = df.select(TX.word_shingles(TX.tokens(F.col("text"))).alias("sh")).collect()
    assert got[0]["sh"] == ["a b c", "b c d"]
    assert got[1]["sh"] == []  # fewer than n tokens
    assert got[3]["sh"] == ["x y z"]


def test_char_poly_hash_matches_python(spark):
    def py_hash(s: str, n: int = 8) -> int:
        return sum(
            (ord(s[i]) if i < len(s) and ord(s[i]) < 128 else (0 if i >= len(s) else ord(s[i])))
            * TX.POW31[i]
            for i in range(n)
        ) % TX.HASH_MOD

    words = ["spark", "dedup", "a", "window merge"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = [r["h"] for r in df.select(TX.char_poly_hash(F.col("w"), 8).alias("h")).collect()]
    assert got == [py_hash(w) for w in words]


def test_jaccard_bounds_and_ordering(spark, sf_dir):
    rows = dedup_ngram_jaccard(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_simhash_deterministic(spark, sf_dir):
    a = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup_simhash(spark, sf_dir).collect()}
    assert a == b
    assert all(0 <= v < (1 << 16) for v in a.values())


def test_minhash_signature_range(spark, sf_dir):
    rows = dedup_minhash(spark, sf_dir).collect()
    for r in rows:
        for i in range(8):
            assert 0 <= r[f"mh{i}"] < TX.HASH_MOD


def test_connected_components_matches_union_find(spark):
    """Distributed min-label propagation ≡ a pure-Python union-find on a
    synthetic graph with a chain (propagation needs multiple rounds), a
    triangle, duplicate/reversed edges, and a self-loop."""
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),        # chain: diameter 4
        (10, 11), (11, 12), (12, 10),          # triangle
        (20, 21), (21, 20), (20, 21),          # dupes + reversal
        (30, 30),                              # self-loop singleton
        (40, 41),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(df).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


def test_connected_components_converges_or_raises(spark):
    """A graph whose diameter exceeds the iteration budget must RAISE, not
    return silently-partial (wrong) component ids; within budget, a path
    graph converges to one component. (r4/r5 verdict carry-over.)"""
    import pytest

    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components

    long_path = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(long_path, max_iterations=3)

    short_path = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src long, dst long"
    )
    got = connected_components(short_path, max_iterations=15).collect()
    assert {r["component_id"] for r in got} == {0}
    assert len(got) == 9


def test_star_cc_matches_union_find(spark):
    """Large-star/small-star ≡ union-find on the mixed synthetic graph
    (chain + triangle + dupes + self-loop + pair)."""
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components_star

    edges = [
        (1, 2), (2, 3), (3, 4), (4, 5),
        (10, 11), (11, 12), (12, 10),
        (20, 21), (21, 20), (20, 21),
        (30, 30),
        (40, 41),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["component_id"] for r in connected_components_star(df).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
        30: 30,
        40: 40, 41: 40,
    }


def test_star_cc_converges_on_long_path(spark):
    """The diameter-halving variant handles the 1000-node path that makes
    plain propagation raise: O(log n) rounds, one component labeled 0."""
    from ntd_gtfs_to_socrata_spark.operators.graph import connected_components_star

    long_path = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "src long, dst long"
    )
    got = connected_components_star(long_path, max_iterations=20).collect()
    assert len(got) == 1001
    assert {r["component_id"] for r in got} == {0}
