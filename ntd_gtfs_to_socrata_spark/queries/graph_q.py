"""Graph analytics over the near-duplicate document graph (▲ north-star;
the reference has no graph surface).

A large-scale training-data pipeline needs more than clustering from its
dedup graph: PageRank-style centrality picks the CANONICAL document per
duplicate cluster (the most-linked variant, the same link-based quality
idea web-corpus curation uses), triangle counts measure how clique-like
the near-dup neighborhoods are (a transcription-farm signature), and the
degree distribution is the first profile you pull before tuning LSH
thresholds. All three run on the exact shingle-Jaccard edge set that
``dedup_connected_components`` uses, so every number here is consistent
with the clustering the dedup pipeline ships.

Oracle strategy: PageRank runs a FIXED iteration count, so the DuckDB
oracle unrolls the iterations as chained CTEs (standard SQL forbids
aggregation inside a recursive term) — the distributed loop is
value-hash checked against a fully declarative computation, same
philosophy as the recursive-CTE oracle for connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.queries import register
from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
    AUDIT_DF_CAP,
    _ngram_jaccard,
    _ngram_oracle,
)

_PR_ITERS = 5
_PR_DAMP = 0.85


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs. The near-dup
    graph is symmetric (both directions of every pair), so every node has
    in-edges and each iteration's GROUP BY covers the full node set."""
    steps = []
    for i in range(_PR_ITERS):
        steps.append(
            f"pr{i + 1} AS (\n"
            f"  SELECT e.dst AS node, {1 - _PR_DAMP} + {_PR_DAMP} * "
            f"sum(p.pr / d.outdeg) AS pr\n"
            f"  FROM edges e JOIN pr{i} p ON p.node = e.src "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst\n)"
        )
    chained = ",\n".join(steps)
    return f"""
WITH pairs AS ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM edges),
{chained}
SELECT node AS doc_id, round(pr, 4) AS pr FROM pr{_PR_ITERS}
"""


@register("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-based centrality of documents inside their near-dup
    neighborhoods: 5 fixed PageRank iterations (operators/graph.py
    ``pagerank``) over the symmetric shingle-Jaccard edge set. The
    highest-rank doc per component is the natural canonical pick when
    'min doc_id' is too arbitrary (e.g. prefer the variant most copies
    derive from)."""
    from ntd_gtfs_to_socrata_spark.operators.graph import pagerank

    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
    # symmetric edges from ONE pass over the pair generator (explode, not
    # union — a union re-executes the inverted-index subtree per branch)
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMP)
    return ranks.select(
        F.col("node").alias("doc_id"), F.round("rank", 4).alias("pr")
    )


TRIANGLE_ORACLE = f"""
WITH pairs AS ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
e AS (SELECT doc_a AS a, doc_b AS b FROM pairs)
SELECT count(*) AS n_triangles
FROM e e1
JOIN e e2 ON e2.a = e1.b
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@register("graph_triangle_count", TRIANGLE_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count over the near-dup graph via the oriented
    edge-edge-edge join: edges already satisfy ``doc_a < doc_b`` (the
    pair generator emits i<j only), so each triangle {a<b<c} is counted
    exactly once as (a,b)+(b,c)+(a,c) — no /6 correction, no symmetric
    blow-up. Scale posture: at 100 TB orient edges low-degree→high-degree
    instead of by id (the standard skew bound: every wedge is generated
    at its lowest-degree vertex); id orientation is used here because the
    oracle must reproduce the same orientation declaratively and dedup
    clumps are degree-bounded anyway.

    The edge set feeds THREE join legs; it is materialized once
    (``localCheckpoint``) so the upstream pair pipeline isn't recomputed
    per leg — the same share-don't-recompute posture every iterative
    operator here uses."""
    pairs = (
        _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .localCheckpoint(eager=True)
    )
    e1 = pairs.alias("e1")
    e2 = pairs.alias("e2")
    e3 = pairs.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
    )
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


DEGREE_ORACLE = f"""
WITH pairs AS ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS degree FROM edges GROUP BY src)
SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
"""


@register("graph_degree_distribution", DEGREE_ORACLE)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup graph — the one-glance profile
    that says whether near-dup mass sits in pairs (degree 1) or
    boilerplate mega-clusters (long tail), and therefore which LSH/df-cap
    knobs to tighten. Two hash aggregations, both map-side combining.

    Endpoints come from ONE ``explode(array(doc_a, doc_b))`` over the
    pair set rather than a two-branch union — a union would duplicate
    the whole upstream pair pipeline in the plan (each branch re-derives
    it), doubling its exchanges; pairs are unique (i<j), so occurrence
    count IS the neighbor count."""
    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
    nodes = pairs.select(
        F.explode(F.array("doc_a", "doc_b")).alias("node")
    )
    deg = nodes.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


def _canonical_oracle() -> str:
    """CC (recursive CTE) + PageRank (unrolled CTEs) + per-component
    argmax, all declarative. Ranks are rounded to 4 decimals BEFORE the
    argmax compare on both sides so float low-bit noise cannot flip the
    winner differently in the two engines."""
    pr_steps = []
    for i in range(_PR_ITERS):
        pr_steps.append(
            f"pr{i + 1} AS (\n"
            f"  SELECT e.dst AS node, {1 - _PR_DAMP} + {_PR_DAMP} * "
            f"sum(p.pr / d.outdeg) AS pr\n"
            f"  FROM edges e JOIN pr{i} p ON p.node = e.src "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst\n)"
        )
    chained = ",\n".join(pr_steps)
    return f"""
WITH RECURSIVE pairs AS ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS outdeg FROM edges GROUP BY src),
pr0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM edges),
{chained},
reach(node, root) AS (
  SELECT DISTINCT src AS node, src AS root FROM edges
  UNION
  SELECT e.dst AS node, r.root AS root FROM reach r JOIN edges e ON e.src = r.node
),
cc AS (SELECT node, min(root) AS comp FROM reach GROUP BY node),
joined AS (
  SELECT cc.comp, cc.node, round(p.pr, 4) AS pr
  FROM cc JOIN pr{_PR_ITERS} p ON p.node = cc.node
),
best AS (SELECT comp, max(pr) AS max_pr FROM joined GROUP BY comp)
SELECT j.comp AS component_id,
       min(j.node) AS canonical_doc,
       max(b.max_pr) AS canonical_pr,
       (SELECT count(*) FROM cc c2 WHERE c2.comp = j.comp) AS n_members
FROM joined j JOIN best b ON b.comp = j.comp AND j.pr = b.max_pr
GROUP BY j.comp
"""


@register("graph_canonical_by_rank", _canonical_oracle())
def graph_canonical_by_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection by centrality: connected components
    give the duplicate clusters, PageRank gives each member's centrality,
    and the cluster's canonical doc is its max-rank member (min doc_id on
    exact rank ties — symmetric clusters produce exact ties after the
    round-4 quantisation both engines apply before comparing). This is
    the principled upgrade over 'keep min doc_id': the most-linked
    variant is the one the other copies derive from.

    Scale posture: both inputs are per-NODE frames of the near-dup
    subgraph (orders of magnitude smaller than the corpus); the argmax
    is one groupBy for the per-component max joined back — the same
    two-pass shape as ``w3_topk_per_group``'s scale variant, no global
    window."""
    from ntd_gtfs_to_socrata_spark.operators.graph import (
        connected_components,
        pagerank,
    )

    # pairs feed BOTH the CC loop and the PageRank loop — materialize
    # once so neither re-derives the pair pipeline; `joined` then feeds
    # three aggregation legs (best / members / winners) and is likewise
    # checkpointed (it's a per-node frame of the near-dup subgraph —
    # small by construction)
    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP).localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    cc = connected_components(pairs, src="doc_a", dst="doc_b").select(
        "node", F.col("component_id").alias("comp")
    )
    pr = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMP).select(
        F.col("node").alias("pnode"), F.round("rank", 4).alias("pr")
    )
    joined = (
        cc.join(pr, cc.node == F.col("pnode"))
        .select("comp", "node", "pr")
        .localCheckpoint(eager=True)
    )
    best = joined.groupBy("comp").agg(F.max("pr").alias("max_pr"))
    members = joined.groupBy("comp").agg(F.count(F.lit(1)).alias("n_members"))
    winners = (
        joined.join(best, "comp")
        .filter(F.col("pr") == F.col("max_pr"))
        .groupBy("comp")
        .agg(F.min("node").alias("canonical_doc"), F.max("max_pr").alias("canonical_pr"))
    )
    return winners.join(members, "comp").select(
        F.col("comp").alias("component_id"),
        "canonical_doc",
        "canonical_pr",
        "n_members",
    )


_LPA_ITERS = 3


def _lpa_oracle() -> str:
    """Unrolled fixed-iteration label propagation as chained CTEs:
    per round, (node, label) vote counts → per-node argmax (count desc,
    label asc) → label update with keep-own fallback."""
    steps = []
    for i in range(_LPA_ITERS):
        steps.append(
            f"""votes{i} AS (
  SELECT e.dst AS node, p.label, count(*) AS c
  FROM edges e JOIN lp{i} p ON p.node = e.src GROUP BY e.dst, p.label
),
best{i} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC) AS rn
    FROM votes{i}) WHERE rn = 1
),
lp{i + 1} AS (
  SELECT a.node, coalesce(b.label, a.label) AS label
  FROM lp{i} a LEFT JOIN best{i} b ON b.node = a.node
)"""
        )
    chained = ",\n".join(steps)
    return f"""
WITH pairs AS ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
lp0 AS (
  SELECT DISTINCT node, node AS label FROM (
    SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges)
),
{chained}
SELECT label AS community, count(*) AS n_members, min(node) AS min_doc_id
FROM lp{_LPA_ITERS} GROUP BY label
"""


@register("graph_label_propagation", _lpa_oracle())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the near-dup graph via deterministic
    fixed-round label propagation (operators/graph.py
    ``label_propagation``): majority-label communities split
    bridge-connected duplicate families that connected components would
    merge — the review queue for borderline LSH thresholds. Output is the
    community profile (label, size, min member)."""
    from ntd_gtfs_to_socrata_spark.operators.graph import label_propagation

    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
    # symmetric edges via explode, not union — one pair-generator execution
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                ),
                F.struct(
                    F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    labels = label_propagation(edges, iterations=_LPA_ITERS)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_doc_id"),
    )


_KCORE_K = 2
# Oracle unroll depth AND the operator's round bound at this call site
# (passed as max_iterations below, so operator and oracle agree whenever
# the operator returns); the fixture graph peels in 2-3 rounds.
_KCORE_LEVELS = 12


def _kcore_oracle() -> str:
    """Unrolled peeling as chained CTEs (the _pagerank_oracle pattern):
    lvl{i+1} keeps edges whose BOTH endpoints have degree >= k within
    lvl{i}. With more levels than the graph needs, the last level IS the
    fixpoint the distributed loop converges to."""
    steps = []
    for i in range(_KCORE_LEVELS):
        steps.append(
            f"lvl{i + 1} AS MATERIALIZED (\n"
            f"  SELECT e.src, e.dst FROM lvl{i} e\n"
            f"  JOIN (SELECT src, count(*) AS c FROM lvl{i} GROUP BY src) da\n"
            f"    ON da.src = e.src AND da.c >= {_KCORE_K}\n"
            f"  JOIN (SELECT src, count(*) AS c FROM lvl{i} GROUP BY src) db\n"
            f"    ON db.src = e.dst AND db.c >= {_KCORE_K}\n)"
        )
    chained = ",\n".join(steps)
    return f"""
WITH pairs AS MATERIALIZED ({_ngram_oracle(df_cap=AUDIT_DF_CAP)}),
lvl0 AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
{chained}
SELECT src AS doc_id, count(*) AS core_degree
FROM lvl{_KCORE_LEVELS} GROUP BY src
"""


@register("graph_k_core", _kcore_oracle())
def graph_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-dup graph: iteratively peel degree-<2 nodes so
    only DENSE duplicate clumps survive — chains and isolated pairs (the
    borderline-Jaccard noise) drop out, leaving the transcription-farm
    cores worth human review. The third iterative-algorithm entry beside
    min-label CC and large-star/small-star, value-hash checked against a
    fixed-unroll declarative replay of the peeling (the PageRank oracle
    pattern).

    The operator is bounded to the oracle's unroll depth
    (``max_iterations=_KCORE_LEVELS``) so the two sides agree WHENEVER
    the operator returns: a graph needing more rounds makes the operator
    RAISE (loudly failing the gate) instead of returning a correct
    k-core the fixed-depth oracle can't replay (r6 ADVICE). Standalone
    callers get the node-count-derived bound (``max_iterations=None``),
    which always converges."""
    from ntd_gtfs_to_socrata_spark.operators.graph import k_core

    pairs = _ngram_jaccard(spark, sf_dir, df_cap=AUDIT_DF_CAP)
    return k_core(
        pairs, k=_KCORE_K, src="doc_a", dst="doc_b", max_iterations=_KCORE_LEVELS
    ).select(
        F.col("node").alias("doc_id"), "core_degree"
    )
