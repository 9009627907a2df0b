"""Distributed connected components over an edge DataFrame.

The operator that turns near-duplicate PAIRS into duplicate CLUSTERS — the
step every large-scale training-data dedup pipeline needs between candidate
generation (MinHash-LSH / shingle Jaccard) and "keep one doc per cluster".
The reference has no graph surface at all (▲ north-star).

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node takes the min of its own label and its
neighbors' labels; fixpoint = components labeled by their minimum node id.
Rounds needed = graph diameter — near-dup graphs are dense clumps with tiny
diameters (2-4), so this converges in a handful of rounds. For adversarial
long-chain graphs, the large-star/small-star variant (Kiveris et al.,
"Connected Components in MapReduce and Beyond") halves the diameter per
round; the propagation loop below is the right default for dedup workloads.

Scale posture per round:
- ONE shuffle join (edges ⋈ labels on node key) + ONE aggregation, both
  hash-partitioned on the node key, so successive rounds reuse partitioning.
- labels are (long, long) pairs — the shuffle payload is 16 bytes/row no
  matter how wide the documents are.
- ``_truncate`` cuts lineage each round; without it the plan doubles
  every iteration and the driver OOMs planning round ~15. It uses fast
  ``localCheckpoint`` by default and RELIABLE ``checkpoint()`` whenever
  the session has a checkpoint dir configured
  (``spark.sparkContext.setCheckpointDir``): localCheckpoint blocks
  live in executor storage, so on a real cluster one lost executor
  mid-loop kills the whole job — a 100 TB run sets the dir and every
  iterative operator in this module switches to DFS-backed
  truncation automatically.
- convergence is detected from ``sum(label)``: labels only ever decrease,
  so an unchanged sum IS the fixpoint — and the sum rides the checkpoint
  job as an ``observe()`` metric (fires on eager materialization), so a
  round is ONE job, with no separate scalar-agg scan and no
  join-and-compare of consecutive label sets.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _truncate(df: DataFrame, supersedes: DataFrame | None = None) -> DataFrame:
    """Lineage truncation for iterative loops: reliable ``checkpoint()``
    (DFS-backed; survives executor loss and lets a 1000-executor run
    recover a mid-loop failure from storage) when the session has a
    checkpoint dir configured, else eager ``localCheckpoint`` (fast;
    blocks live in executor memory/disk — correct on local[*] and the
    right default when no dir is set, since ``checkpoint()`` without a
    dir raises). ``observe()`` metrics attached upstream fire on either
    materialization, so the one-job-per-round convergence probe works
    identically in both modes (pinned by test_graph_reliable_checkpoint).

    ``supersedes`` (r11 ADVICE): the loop-carried frame this result
    replaces. Once the new checkpoint has materialized (eager=True), the
    old round's DFS checkpoint is dead weight — Spark only reclaims it
    via referenceTracking GC with cleanCheckpoints=true, so a long
    reliable-mode run would otherwise grow checkpoint storage linearly
    with rounds. The superseded frame's files are deleted here,
    best-effort; only pass a frame nothing downstream will recompute.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir():
        out = df.checkpoint(eager=True)
        if supersedes is not None:
            _drop_checkpoint(supersedes)
        return out
    return df.localCheckpoint(eager=True)


# Count of _drop_checkpoint attempts that raised (r12 ADVICE item 3): the
# deletion reaches through private py4j accessors, so a Spark upgrade that
# renames them would silently turn GC into a no-op behind the broad except
# — this counter makes that regression observable outside the unit test
# (assert it stays 0 after a loop, or alert on growth in a long run).
SKIPPED_CHECKPOINT_CLEANUPS = 0


def _drop_checkpoint(df: DataFrame) -> None:
    """Best-effort delete of a SUPERSEDED reliable checkpoint's files.

    The checkpoint path lives on the LogicalRDD the checkpointed Dataset
    wraps; a frame whose analyzed plan is NOT a bare LogicalRDD (never
    reliably checkpointed, or a projection OVER a live checkpoint — e.g.
    pagerank's round-0 ranks = nodes.select(...), whose underlying
    checkpoint must NOT be freed) is the documented no-op, checked by
    class BEFORE touching rdd() so it never lands in the failure count.
    Actual deletion failures are swallowed (cleanup must never fail the
    loop) but COUNTED in SKIPPED_CHECKPOINT_CLEANUPS so a silent API
    drift is observable."""
    global SKIPPED_CHECKPOINT_CLEANUPS
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return  # nothing of its own to free
        opt = plan.rdd().getCheckpointFile()
        if not opt.isDefined():
            return
        path = opt.get()
        sc = df.sparkSession.sparkContext
        jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    except Exception:  # noqa: BLE001 — cleanup is advisory by design
        SKIPPED_CHECKPOINT_CLEANUPS += 1
        return


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Return (node, component_id) for every node appearing in ``edges``,
    where component_id is the minimum node id in the component.

    ``edges`` is treated as undirected; self-loops and duplicates are fine.

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iterations`` — partial labels are silently WRONG component ids
    (a long-chain graph whose diameter exceeds the budget would split one
    component into many), so exhaustion must never return. Near-dup graphs
    converge in a handful of rounds; a raise here means the input is not a
    dedup-shaped graph — raise the budget or switch to a diameter-halving
    scheme (large-star/small-star, Kiveris et al.).
    """
    # both directions from ONE pass over the edge input (explode of a
    # 2-element array, not a union of two branches): a union re-lists —
    # and re-EXECUTES — the upstream edge-producing subtree per branch,
    # which is ruinous when edges come from an expensive pair generator
    # (dedup verify joins, shingle inverted indexes)
    bidir = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .select(
            F.explode(
                F.array(
                    F.struct("u", "v"),
                    F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .transform(_truncate)
    )
    # convergence scalars ride the checkpoint job via observe() — metrics
    # fire when the eager localCheckpoint materializes, so each round is
    # ONE job (join+agg+checkpoint+probe), not a checkpoint job plus a
    # separate sum(label) scan
    from pyspark.sql import Observation

    obs0 = Observation(f"cc_seed_{uuid.uuid4().hex[:8]}")
    labels = (
        bidir.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .observe(obs0, F.sum("label").alias("s"))
        .transform(_truncate)
    )
    prev_sum = obs0.get["s"]
    converged = False
    # NOTE (r14, measured and REJECTED): fusing TWO propagation steps per
    # materialized round — sound for correctness (labels are monotone
    # non-increasing, so an unchanged sum across a double round still
    # certifies the fixpoint) — made every consumer's job count WORSE
    # (dedup_soft_weight 24 -> 31 jobs, tp_cluster_aware_split -> 30,
    # release_pipeline_counts -> 38): near-dup graphs converge in ~2
    # steps, so the fused loop executes extra propagation joins past the
    # fixpoint (detection lags a full double round) and AQE submits the
    # deeper per-round plan as MORE stage-jobs, not fewer. Single-step
    # rounds with the probe riding each checkpoint are the measured
    # optimum for fast-converging graphs.
    for i in range(max_iterations):
        nbr_min = (
            bidir.join(labels, bidir.v == labels.node)
            .groupBy(F.col("u").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        obs = Observation(f"cc_round_{i}_{uuid.uuid4().hex[:8]}")
        labels = (
            labels.join(nbr_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .observe(obs, F.sum("label").alias("s"))
            .transform(lambda d, prev=labels: _truncate(d, supersedes=prev))
        )
        new_sum = obs.get["s"]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iterations} "
            "iterations (graph diameter exceeds the propagation budget); "
            "partial labels would be wrong — raise max_iterations or use "
            "connected_components_star (diameter-halving)"
        )
    return labels.select("node", F.col("label").alias("component_id"))


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    trunc_every: int = 2,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge set; returns
    (node, rank) for every node that appears as a source or target.

    The classic centrality score a web-corpus curation pipeline uses for
    link-based document quality (the reference has no graph surface; ▲
    north-star). FIXED iteration count, not convergence detection, so the
    result is a deterministic function of the edge set and a declarative
    (unrolled-CTE) SQL oracle can reproduce it exactly.

    Simplified formulation (no dangling-mass redistribution):
    ``r_0(n) = 1.0``; ``r_{i+1}(n) = (1-d) + d * Σ_{(m,n)∈E} r_i(m)/outdeg(m)``.
    Nodes with no in-edges settle at ``1-d``.

    Scale posture per iteration: ONE shuffle join (edges ⋈ ranks on the
    source key — out-degrees are precomputed once and travel WITH the
    edge rows, so no second join) + ONE aggregation on the target key.
    Rank state is (long, double) = 16 bytes/row regardless of document
    width. Lineage is truncated every ``trunc_every`` rounds (not every
    round): a FIXED-iteration loop has no per-round convergence probe
    riding the checkpoint job, so each materialization is pure overhead
    — one scheduled job plus a full write of the rank state. A cadence
    of 2 keeps the plan depth bounded (it doubles, once) while halving
    the checkpoint jobs and state writes; measured 3.2s → 2.8s on the
    near-dup graph at sf0.1 with bit-identical ranks, and at 100 TB the
    same cadence halves the DFS bytes written by reliable-mode
    checkpointing. The final iteration is never truncated — the caller's
    one action executes it directly and a checkpoint there would only
    add a second materialization of the result. Skewed in-degree (a
    viral page) is an AQE skew-join case; the contribution aggregation
    itself partial-combines map-side.
    """
    if trunc_every < 1:
        raise ValueError(f"trunc_every must be >= 1, got {trunc_every}")
    # materialize the distinct edge set ONCE before deriving out-degrees
    # and the node universe — e_deg and nodes otherwise each re-execute
    # the full upstream edge-producing subtree (expensive when edges come
    # from a pair generator)
    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .distinct()
        .transform(_truncate)
    )
    outdeg = e.groupBy("e_src").agg(F.count(F.lit(1)).alias("outdeg"))
    # out-degree joined ONCE and carried on the edge row — each iteration
    # then needs only the rank join, not a rank join plus a degree join
    e_deg = e.join(outdeg, "e_src").transform(_truncate)
    nodes = (
        e.select(F.explode(F.array("e_src", "e_dst")).alias("node"))
        .distinct()
        .transform(_truncate)
    )
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    # the last CHECKPOINTED rank frame — with a cadence > 1 the frame a
    # new checkpoint supersedes is this one, not the (un-truncated)
    # previous loop value, whose plan is a projection with no files to GC
    last_ckpt: DataFrame | None = None
    for i in range(iterations):
        contrib = (
            e_deg.join(ranks, e_deg.e_src == ranks.node)
            .groupBy(F.col("e_dst").alias("node2"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("in_sum"))
        )
        ranks = nodes.join(contrib, nodes.node == F.col("node2"), "left").select(
            "node",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce(F.col("in_sum"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % trunc_every == 0 and i < iterations - 1:
            ranks = _truncate(ranks, supersedes=last_ckpt)
            last_ckpt = ranks
    return ranks


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star: every node u links its STRICTLY LARGER neighbors to the
    minimum of its closed neighborhood min(Γ⁺(u)). Preserves connectivity;
    strictly reduces edge "height". One shuffle join + one agg."""
    bidir = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    mins = bidir.groupBy("u").agg(F.min("v").alias("mn"))
    m = F.least(F.col("u"), F.col("mn")).alias("new_v")
    return (
        bidir.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), m.alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: orient each edge high→low; every high node links all its
    smaller neighbors (and itself) to their minimum. Completes the
    star-collapse the large-star set up. One shuffle join + one agg."""
    hi_lo = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = hi_lo.groupBy("u").agg(F.min("v").alias("mn"))
    linked = hi_lo.join(mins, "u")
    to_min = linked.select(F.col("v").alias("u"), F.col("mn").alias("v"))
    self_link = mins.select("u", F.col("mn").alias("v"))
    return to_min.unionByName(self_link).filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the adversarial-diameter-safe twin of ``connected_components``.

    Min-label propagation needs diameter-many rounds (a 1M-node chain ⇒
    1M shuffles); star rounds HALVE the effective diameter each time, so
    convergence is O(log n) rounds on ANY graph shape. Per round: two
    (groupBy + join) pairs over an edge set that only shrinks (edges
    collapse toward component minima), every shuffle keyed on the node id
    with 16-byte payloads, lineage truncated per round exactly like the
    propagation loop. Use this when the input is not a dedup-shaped clump
    graph — or as the fallback after ``connected_components`` raises.

    Returns (node, component_id), component_id = min node id, identical
    contract to ``connected_components``.
    """
    # one upstream execution total: the raw projection is checkpointed,
    # then BOTH the working edge set and the node universe derive from it
    # (previously e and all_nodes each re-executed the upstream edge
    # producer, the union inside all_nodes twice over)
    base = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).transform(_truncate)
    e = (
        base.filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(_truncate)
    )
    # every node that appears anywhere, including isolated self-loop nodes
    all_nodes = (
        base.select(F.explode(F.array("u", "v")).alias("node"))
        .distinct()
        .transform(_truncate)
    )
    from pyspark.sql import Observation

    converged = False
    prev_sig = None
    for i in range(max_iterations):
        # fixpoint when the (count, sum(u), sum(v)) signature stops moving:
        # star rounds only rewire edges downward, so an unchanged signature
        # means an unchanged edge set. The signature rides the checkpoint
        # job via observe() (metrics fire on eager materialization) — one
        # job per round, no separate scalar-agg scan
        obs = Observation(f"ccstar_round_{i}_{uuid.uuid4().hex[:8]}")
        e = (
            _small_star(_large_star(e))
            .observe(
                obs,
                F.count(F.lit(1)).alias("n"),
                F.sum("u").alias("su"),
                F.sum("v").alias("sv"),
            )
            .transform(lambda d, prev=e: _truncate(d, supersedes=prev))
        )
        got = obs.get
        sig = (got["n"], got["su"], got["sv"])
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iterations} rounds — unexpected for any graph "
            "(O(log n) bound); check for adversarial inputs"
        )
    # after collapse every edge points node→component-min; nodes absent
    # from the final edge set are their own component (singletons)
    labels = e.groupBy("u").agg(F.min("v").alias("component_id"))
    return all_nodes.join(labels, all_nodes.node == labels.u, "left").select(
        "node",
        F.coalesce(F.col("component_id"), F.col("node")).alias("component_id"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    trunc_every: int = 2,
) -> DataFrame:
    """Fixed-iteration label propagation (community detection): every node
    starts with its own id as label; each round it adopts the most
    frequent label among its in-neighbors (tiebreak: smaller label), or
    keeps its own when it has none. Deterministic by construction —
    FIXED rounds + total-order tiebreak — so an unrolled-CTE SQL oracle
    reproduces it exactly (the ``pagerank`` philosophy; classic async LPA
    with random visit order is irreproducible under task retries and has
    no place in a value-checked pipeline).

    Communities differ from connected components on bridged graphs: a
    thin bridge between two dense clumps keeps ONE component but TWO
    majority-label communities — the signal for "these two duplicate
    families touch but shouldn't merge" (threshold-boundary pairs).

    Scale posture per round: one shuffle join (edges ⋈ labels on the
    source key), one (node, label) count aggregate (map-side combined),
    one per-node argmax via ``min(struct(-c, label))`` — lexicographic
    struct ordering IS "highest count, tie to smallest label", computed
    with map-side partial aggregation instead of a per-node-partition
    window sort — then one join back to the node set, all
    hash-partitioned on the node key. Label state is 16 bytes/row.
    Lineage is truncated every ``trunc_every`` rounds and never on the
    final one (the ``pagerank`` rationale: fixed-iteration loops carry no
    per-round convergence probe, so each skipped checkpoint is one fewer
    job and one fewer full state write)."""
    if trunc_every < 1:
        raise ValueError(f"trunc_every must be >= 1, got {trunc_every}")
    e = edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst")).distinct()
    e = e.transform(_truncate)
    nodes = (
        e.select(F.col("e_src").alias("node"))
        .unionByName(e.select(F.col("e_dst").alias("node")))
        .distinct()
        .transform(_truncate)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    last_ckpt: DataFrame | None = None
    for i in range(iterations):
        votes = (
            e.join(labels, e.e_src == labels.node)
            .groupBy(F.col("e_dst").alias("node2"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = (
            votes.groupBy("node2")
            .agg(
                F.min(
                    F.struct((-F.col("c")).alias("negc"), F.col("label").alias("l"))
                ).alias("m")
            )
            .select("node2", F.col("m.l").alias("new_label"))
        )
        labels = labels.join(best, labels.node == F.col("node2"), "left").select(
            "node",
            F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
        )
        if (i + 1) % trunc_every == 0 and i < iterations - 1:
            labels = _truncate(labels, supersedes=last_ckpt)
            last_ckpt = labels
    return labels


def k_core(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop nodes
    whose degree in the SURVIVING subgraph is < k until a fixpoint; return
    the surviving nodes with their within-core degree.

    Input is an UNDIRECTED pair list (one row per pair); it is symmetrized
    here so degree = count of incident edges. Degrees are maintained
    INCREMENTALLY (r8 verdict task 2): the full edge set is aggregated
    ONCE up front; each peel round then aggregates only the DELTA edge
    set — edges from a surviving node into a just-removed one — and
    subtracts those counts from the maintained degree table. Per-round
    shuffle volume is therefore proportional to the edges REMOVED that
    round (Σ over rounds = |E|, the sum telescopes), not to the surviving
    edge set × rounds — the term that made the non-incremental loop
    super-linear on deep graphs (9.9× wall at 10× data in the r8 sf1
    sweep; rounds grow with graph depth).

    Loop contract as ``connected_components``: ``localCheckpoint``
    truncates lineage; the fixpoint probe (peel set empty) rides the
    DEGREE checkpoint one step ahead as an ``observe()`` metric — each
    deg materialization reports how many of its rows are already < k, so
    no round pays a separate peel-set job. Peeling removes at least
    one node per non-terminal round, so ``node_count`` rounds always
    suffice — the DEFAULT bound (``max_iterations=None``) is derived from
    the node count (one control-plane scalar), making exhaustion
    unreachable. A long simple path is the worst case: k=2 peels only the
    two endpoints per round, so an n-node chain needs ~n/2 rounds — the
    r6 ADVICE case that overran the old fixed default of 30. Pass an
    explicit ``max_iterations`` only to enforce an external round budget
    (e.g. the oracle's unroll depth); exhaustion then RAISES — a partial
    peel is a wrong k-core, never returned.

    Scale posture: every shuffle is keyed on a node id over the delta
    edge set (shrinking) or the node-sized degree table; no window, no
    collect of anything but the per-round empty-check scalar.
    """
    from pyspark.sql import functions as F

    # symmetrize via explode, not union — one execution of the upstream
    # pair generator instead of one per union branch
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .select(
            F.explode(
                F.array(
                    F.struct("s", "d"),
                    F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .transform(_truncate)
    )
    from pyspark.sql import Observation

    # the ONE full-edge-set aggregation; every later round touches only
    # delta edges and the node-sized degree table. The fixpoint probe
    # rides ONE STEP AHEAD on the degree checkpoint (r14): each deg
    # materialization observes how many of ITS rows are already below k —
    # the size of the NEXT round's peel set — so the round never pays a
    # separate job (the old shape checkpointed `low` per round just to
    # read its emptiness: 3 checkpoint jobs per peel instead of 2). `low`
    # is now a lazy filter over the materialized deg RDD — its three
    # embeddings below re-run a map over checkpointed rows, nothing else.
    # The node-count bound rides the same observe (the old deg.count()
    # control job removed).
    obs0 = Observation(f"kcore_seed_{uuid.uuid4().hex[:8]}")
    deg = (
        e.groupBy("s")
        .agg(F.count(F.lit(1)).alias("deg"))
        .observe(
            obs0,
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum((F.col("deg") < k).cast("int")).alias("n_low"),
        )
        .transform(_truncate)
    )
    seed_metrics = obs0.get
    if max_iterations is None:
        # one round per node is a hard upper bound (each non-terminal
        # round removes >= 1 node); +1 for the terminal fixpoint check
        max_iterations = seed_metrics["n_nodes"] + 1
    # sum() over an empty frame observes NULL — an empty degree table
    # (edgeless input, or a graph that fully peels away) means an empty
    # peel set
    n_low = seed_metrics["n_low"] or 0
    for i in range(max_iterations):
        if n_low == 0:
            return deg.select(
                F.col("s").alias("node"),
                F.col("deg").cast("long").alias("core_degree"),
            )
        low = deg.filter(F.col("deg") < k).select("s")
        low_d = low.select(F.col("s").alias("d"))
        # delta degree loss: edges whose DEST was just removed but whose
        # source survives lose the source one incident edge. Aggregates
        # ONLY the removed edges — never the surviving set.
        lost = (
            e.join(low_d, "d", "semi")
            .join(low, "s", "left_anti")
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("lost"))
        )
        obs = Observation(f"kcore_round_{i}_{uuid.uuid4().hex[:8]}")
        deg = (
            deg.join(low, "s", "left_anti")
            .join(lost, "s", "left")
            .select(
                "s",
                (F.col("deg") - F.coalesce(F.col("lost"), F.lit(0))).alias("deg"),
            )
            .observe(obs, F.sum((F.col("deg") < k).cast("int")).alias("n_low"))
            .transform(lambda d, prev=deg: _truncate(d, supersedes=prev))
        )
        # shrink the surviving edge set (map-side with a broadcast low;
        # needed so later delta joins see only surviving edges)
        e = (
            e.join(low, "s", "left_anti")
            .join(low_d, "d", "left_anti")
            .transform(lambda d, prev=e: _truncate(d, supersedes=prev))
        )
        n_low = obs.get["n_low"] or 0
    raise RuntimeError(
        f"k_core did not reach a fixpoint within the caller-imposed bound of "
        f"{max_iterations} peeling rounds (peeling needs at most one round "
        "per node — long chains peel only from the ends, so a ~2*bound-node "
        "path legitimately exceeds it); raise max_iterations or pass None "
        "to derive the bound from the node count"
    )


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg hubs & authorities) over a DIRECTED
    edge set; returns (node, auth_raw, hub_raw) as exact BIGINTs.

    The fourth iterative-graph entry beside PageRank / CC / k-core, and
    the one that needs edge DIRECTION: on a containment graph (src is
    mostly contained in dst) authorities are the heavily-quoted canonical
    originals and hubs the aggregator/compilation documents — the curation
    signal that separates "source worth keeping" from "scraper mashup".

    Determinism by construction: with h_0 = 1 and the classic unnormalized
    updates ``a_i(n) = Σ_{(m,n)∈E} h_{i-1}(m)`` then ``h_i(n) =
    Σ_{(n,m)∈E} a_i(m)``, every intermediate is an INTEGER (sums of
    integer products), so all aggregation runs in BIGINT — exact and
    summation-order-free on any engine, unlike float PageRank whose final
    round() tolerates an ulp. Normalization (one exact division per node)
    is left to the caller so the raw scores stay integers here.

    Scale posture per iteration: one edge⋈score shuffle join + one
    node-keyed aggregation per direction — identical shape to
    ``pagerank`` (score state is 16 bytes/node; ``localCheckpoint``
    truncates lineage). Values grow like (max degree)^iterations, so the
    BIGINT budget bounds iterations at ~4 for web-scale degrees — HITS
    converges in spirit by then, and the fixed count is what makes the
    unrolled-CTE oracle exact.
    """
    from pyspark.sql import functions as F

    if iterations < 1:
        # iterations=0 would leave auth undefined (advisor r8): reject the
        # degenerate call instead of raising a confusing TypeError later.
        raise ValueError(f"hits requires iterations >= 1, got {iterations}")

    e = (
        edges.select(F.col(src).alias("e_src"), F.col(dst).alias("e_dst"))
        .distinct()
        .transform(_truncate)
    )
    nodes = (
        e.select(F.explode(F.array("e_src", "e_dst")).alias("node"))
        .distinct()
        .transform(_truncate)
    )
    hub = nodes.select("node", F.lit(1).cast("long").alias("h"))
    auth = None
    for _ in range(iterations):
        a_in = (
            e.join(hub, e.e_src == hub.node)
            .groupBy(F.col("e_dst").alias("node2"))
            .agg(F.sum("h").alias("a_sum"))
        )
        auth = (
            nodes.join(a_in, nodes.node == F.col("node2"), "left")
            .select(
                "node",
                F.coalesce(F.col("a_sum"), F.lit(0)).cast("long").alias("a"),
            )
            .transform(lambda d, prev=auth: _truncate(d, supersedes=prev))
        )
        h_out = (
            e.join(auth, e.e_dst == auth.node)
            .groupBy(F.col("e_src").alias("node2"))
            .agg(F.sum("a").alias("h_sum"))
        )
        hub = (
            nodes.join(h_out, nodes.node == F.col("node2"), "left")
            .select(
                "node",
                F.coalesce(F.col("h_sum"), F.lit(0)).cast("long").alias("h"),
            )
            .transform(lambda d, prev=hub: _truncate(d, supersedes=prev))
        )
    return nodes.join(auth, "node").join(hub, "node").select(
        "node",
        F.col("a").alias("auth_raw"),
        F.col("h").alias("hub_raw"),
    )


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS over an UNDIRECTED pair list: hop distance from
    the nearest seed, up to ``max_hops``; unreached nodes are absent.
    Returns (node, dist) with dist in [0, max_hops], exact integers.

    Each round is one distance-frontier ⋈ edges shuffle + a node-keyed
    min — the connected-components loop shape with a bounded round count
    (``max_hops`` is a semantic parameter here, not a convergence bound:
    distance-to-trusted-seed beyond a few hops carries no curation
    signal, which is also what keeps the unrolled-CTE oracle exact).
    State is one (node, dist) row per REACHED node; the frontier join
    prunes to rows that can still improve, so late rounds touch only the
    expanding rim. Lineage is truncated every second round and never on
    the final one (``max_hops`` is fixed — no convergence probe rides the
    checkpoint, so each skipped one is a job and a state write saved).
    """
    from pyspark.sql import functions as F

    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .select(
            F.explode(
                F.array(
                    F.struct("s", "d"),
                    F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .transform(_truncate)
    )
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"), F.lit(0).cast("int").alias("dist")
    ).transform(_truncate)
    last_ckpt: DataFrame | None = None
    for i in range(max_hops):
        # relax only the RIM — nodes first reached in round i (dist == i).
        # Lossless by the BFS invariant: distances never decrease under
        # the min-merge, so a node settled at dist k < i was already
        # relaxed in round k and re-relaxing it can only re-derive
        # nd = k + 1 <= existing. The frontier join's dist side shrinks
        # from |reached so far| to |newly reached| (guide §2.3: shuffle
        # the rim, not the accumulated state).
        frontier = dist.filter(F.col("dist") == F.lit(i))
        relaxed = (
            e.join(frontier, e.s == frontier.node)
            .groupBy(F.col("d").alias("node2"))
            .agg((F.min("dist") + F.lit(1)).alias("nd"))
        )
        dist = dist.join(relaxed, dist.node == F.col("node2"), "full").select(
            F.coalesce(F.col("node"), F.col("node2")).alias("node"),
            F.least(
                F.coalesce(F.col("dist"), F.lit(2147483647)),
                F.coalesce(F.col("nd"), F.lit(2147483647)),
            ).alias("dist"),
        )
        if (i + 1) % 2 == 0 and i < max_hops - 1:
            dist = _truncate(dist, supersedes=last_ckpt)
            last_ckpt = dist
    return dist


def bfs_distances_per_seed(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Per-SEED BFS over an undirected pair list: (seed, node, dist) for
    every node within ``max_hops`` of each seed — the state bfs_distances
    collapses to nearest-seed form, kept seed-keyed so per-seed
    statistics (closeness, reach, ego-net size) can aggregate over it.

    Same loop shape as ``bfs_distances`` with the seed id carried through
    the relax/merge keys: per round one frontier⋈edges shuffle + a
    (seed, node)-keyed integer min. State is one row per (seed, reached
    node) — fan-out is bounded by seeds x ego-net size, so the seed set
    must be bounded by construction (sampled probes, trusted roots), not
    corpus-proportional: at a corpus-scaled seed count prefer
    ``bfs_distances``'s nearest-seed collapse.
    """
    from pyspark.sql import functions as F

    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .select(
            F.explode(
                F.array(
                    F.struct("s", "d"),
                    F.struct(F.col("d").alias("s"), F.col("s").alias("d")),
                )
            ).alias("e")
        )
        .select("e.s", "e.d")
        .distinct()
        .transform(_truncate)
    )
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("seed"),
        F.col(seeds.columns[0]).alias("node"),
        F.lit(0).cast("int").alias("dist"),
    ).transform(_truncate)
    last_ckpt: DataFrame | None = None
    for i in range(max_hops):
        # rim-only relaxation, per seed — the ``bfs_distances`` argument
        # applies pointwise per (seed, node): a (seed, node) pair settled
        # at dist k < i re-derives only nd = k + 1 <= existing
        frontier = dist.filter(F.col("dist") == F.lit(i))
        relaxed = (
            e.join(frontier, e.s == frontier.node)
            .groupBy("seed", F.col("d").alias("node2"))
            .agg((F.min("dist") + F.lit(1)).alias("nd"))
            .withColumnRenamed("seed", "seed2")
        )
        dist = dist.join(
            relaxed,
            (dist.seed == F.col("seed2")) & (dist.node == F.col("node2")),
            "full",
        ).select(
            F.coalesce(F.col("seed"), F.col("seed2")).alias("seed"),
            F.coalesce(F.col("node"), F.col("node2")).alias("node"),
            F.least(
                F.coalesce(F.col("dist"), F.lit(2147483647)),
                F.coalesce(F.col("nd"), F.lit(2147483647)),
            ).alias("dist"),
        )
        # fixed-hop loop — truncate every second round, never the final
        # one (the ``bfs_distances`` rationale)
        if (i + 1) % 2 == 0 and i < max_hops - 1:
            dist = _truncate(dist, supersedes=last_ckpt)
            last_ckpt = dist
    return dist
