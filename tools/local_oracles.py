"""Python-scalar DuckDB UDFs backing LOCAL_ORACLES entries.

The driver's harness runs plain DuckDB, so oracles that need a Python
scalar (zlib_len, the BPE trainer below) cannot ship through
``oracle_sql()`` — they register here and ``tools/check_oracle.py``
checks them at full value-hash strength locally (see
``ntd_gtfs_to_socrata_spark/queries/__init__.py`` LOCAL_ORACLES).

The BPE reference trainer is deliberately a SECOND implementation of the
algorithm (same as the one in tests/test_entity_res_tokenizer.py, which
pinned the distributed trainer before these oracles existed): plain
dict-of-tuples Python over the parquet corpus, no Spark, no shared code
with the package — so a bug in the package's regexp-fold or shuffle
plumbing cannot cancel out of the comparison.
"""

from __future__ import annotations

import re
from collections import Counter
from functools import lru_cache

import duckdb


@lru_cache(maxsize=None)
def _bpe_merges(sf_dir: str, n_merges: int) -> tuple:
    """Reference BPE trainer over ``{sf_dir}/documents.parquet``:
    whitespace tokens (len >= 2) weighted by frequency, leftmost
    non-overlapping merge fold, tie-break count desc / left asc / right
    asc — the exact contract of both package trainers. Returns a tuple
    of (rank, left, right, merged, n_occurrences)."""
    rows = duckdb.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    wc = Counter(
        t
        for (txt,) in rows
        for t in re.split(r"\s+", txt.strip())
        if len(t) >= 2
    )
    vocab = {tuple(w): n for w, n in wc.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        (left, right), n_occ = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, n_occ))
        new_vocab: dict = {}
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
    return tuple(merges)


@lru_cache(maxsize=None)
def _seg_len(sf_dir: str, n_merges: int, tok: str) -> int:
    """Symbol count of ``tok`` under the trained merge table (tokens
    below the vocab's length floor are 1 symbol by definition)."""
    if len(tok) < 2:
        return 1
    syms = list(tok)
    for _, left, right, _, _ in _bpe_merges(sf_dir, n_merges):
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


def register_bpe_udfs(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """Register the BPE oracle scalars on ``con`` (training is lazy —
    first UDF call pays it once per (sf_dir, n_merges) via lru_cache).

    - ``bpe_len(tok)``: segment length under the 3-merge table
      (bpe_token_counts' apply side).
    - ``bpe{3,50}_{left,right,merged}(rank)`` / ``bpe{3,50}_n(rank)`` /
      ``bpe{3,50}_count(dummy)``: row accessors over the learned merge
      tables (bpe_train_merges / bpe_train_merges_sampled; the sampled
      trainer's 100k vocab cap exceeds every fixture vocab, so the full
      reference trainer replays it exactly — the same property
      tests/test_entity_res_tokenizer.py pins against the package)."""
    B, V = duckdb.typing.BIGINT, duckdb.typing.VARCHAR

    con.create_function(
        "bpe_len", lambda tok: _seg_len(sf_dir, 3, tok), [V], B
    )

    def accessor(n_merges: int, idx: int, cast):
        def f(rank):
            return cast(_bpe_merges(sf_dir, n_merges)[int(rank) - 1][idx])

        return f

    for pfx, nm in (("bpe3", 3), ("bpe50", 50)):
        con.create_function(f"{pfx}_left", accessor(nm, 1, str), [B], V)
        con.create_function(f"{pfx}_right", accessor(nm, 2, str), [B], V)
        con.create_function(f"{pfx}_merged", accessor(nm, 3, str), [B], V)
        con.create_function(f"{pfx}_n", accessor(nm, 4, int), [B], B)
        def count_fn(_dummy, _nm=nm):
            return len(_bpe_merges(sf_dir, _nm))

        # duckdb reads the raw signature (defaults still count as
        # parameters), so wrap to a strict 1-arg callable
        con.create_function(
            f"{pfx}_count", (lambda f: lambda d: f(d))(count_fn), [B], B
        )
