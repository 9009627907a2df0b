"""Scoped stage-boundary caching for multi-consumer subtrees.

AQE's exchange reuse collapses re-listed copies of a shared subtree ONLY
when the copies canonicalize identically — and per-consumer column
pruning routinely breaks that (each consumer's copy scans different
columns, so the canonical plans differ and every copy re-executes its
shuffles). Measured in r7 with tools/measure_exchanges.py:
``rag_bm25_topk``'s (doc_id, token) term-frequency aggregate executed
more than once, and ``tp_perplexity_filter`` re-ran the whole unigram
scoring pipeline for its threshold branch. Where that happens, the fix is
a ``persist()`` at the stage boundary — reuse by CACHE SEMANTICS, which
does not depend on canonicalization.

``stage_boundary`` adds the lifecycle discipline the r6 ADVICE asked for
(plans/corpus_release.py grew it first): registry queries must return
LAZY frames (the driver/bench collect later), so they cannot unpersist
before returning — instead, at most ONE persisted frame stays live per
scope, the predecessor being unpersisted when the scope is re-entered.
Repeated invocations (oracle gate, bench's timed passes) therefore never
accumulate cached stages, and each bench pass pays the honest cold cost.

At 100 TB the same boundary becomes a checkpoint to the lake (write the
stage frame to parquet, read it back) — the plan shape downstream is
identical; only the materialization medium changes.

One visible side effect: Spark's cache manager substitutes a cached plan
into ANY later query whose logical plan embeds the identical subtree (e.g.
``text_unigram_logprob`` run after ``tp_perplexity_filter`` reads the
scores cache). Values are unchanged — the cache holds exactly what the
subtree computes — but a timing-sensitive caller (the exchange-measure
test) should ``release_all()`` + ``spark.catalog.clearCache()`` first.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

# one live frame per scope; scopes are the closed set of static strings
# the query modules pass, so the dict is bounded by construction — the
# lifecycle risk is concurrency, not growth, hence the lock (advisor r7)
_LIVE: dict[str, DataFrame] = {}
_LOCK = threading.Lock()


def stage_boundary(df: DataFrame, scope: str) -> DataFrame:
    """Persist ``df`` as a shared stage boundary, retiring the previous
    holder of ``scope`` first. The unpersist MUST precede the persist:
    the cache manager dedupes a new entry against any live entry with the
    same canonical plan, so persist-then-unpersist would silently leave
    the new frame uncached. The whole swap runs under the lock so
    concurrent query construction can't interleave two swaps of one
    scope (advisor r7)."""
    with _LOCK:
        prev = _LIVE.pop(scope, None)
        if prev is not None:
            prev.unpersist()
        df = df.persist()
        _LIVE[scope] = df
    return df


def release_all() -> None:
    """Unpersist every live stage boundary (test teardown hook)."""
    with _LOCK:
        frames = list(_LIVE.values())
        _LIVE.clear()
    for f in frames:
        f.unpersist()
