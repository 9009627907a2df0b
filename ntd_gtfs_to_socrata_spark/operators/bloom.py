"""Native Bloom-filter build/probe as pure Column expressions.

The 100 TB scale sibling of the J3 deletion anti-join
(publish_to_catalog.py:416-497 locates deletions, then removes them):
when the deletion/membership set is too large to broadcast raw but its
BITS fit in a few KB, a Bloom filter prefilter lets the probe side drop
definite-negatives MAP-SIDE, so only possible-members (true members + a
small false-positive tail) ever reach the exact join's shuffle. Combined
with the exact anti-join on the survivors, the result is EXACTLY the
anti-join — false positives are resolved by the join, false negatives
are impossible — so the composition stays value-hash checkable against
a plain ``NOT IN`` oracle.

Spark's own runtime row-level filtering uses the same shape internally
(BloomFilterAggregate / BloomFilterMightContain), but those expressions
are not in the public function registry; this module builds the same
thing from public primitives:

- build: k hash positions per key (``xxhash64`` with k seed columns,
  ``pmod`` into the bit space) → explode → group by 64-bit word index →
  ``bit_or`` of the in-word masks → collect ``num_bits/64`` longs to the
  driver. The collect is CONTROL-PLANE: 1024 longs (8 KB) for a 65 536
  bit filter, independent of key-set cardinality.
- probe: mask lookup via ``element_at`` on two literal arrays (the word
  array and a 64-entry power-of-two table — ``shiftleft`` in the Python
  API only accepts literal shift amounts) → ``bitwiseAND`` → all-k
  conjunction. Pure JVM-side expressions, whole-stage-codegen friendly,
  no Python worker in the hot path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# element_at(POW2, bit+1) == 1 << bit for bit in [0, 63]; bit 63 is the
# sign bit, expressed as min-long to stay inside signed 64-bit range
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k hash positions of ``key`` in a ``num_bits``-wide bit space.

    Seeding: ``xxhash64(seed, key)`` with a literal per-hash seed — the
    standard cheap way to derive k independent hash functions from one
    base hash (the seed perturbs the streamed input).
    """
    return [
        F.pmod(F.xxhash64(F.lit(seed), key), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
) -> list[int]:
    """Aggregate the key set into a Bloom bitmask; return it as a list of
    ``num_bits / 64`` longs (word ``w`` holds bits ``64w .. 64w+63``).

    One shuffle (groupBy word index, ~num_bits/64 groups) with map-side
    partial ``bit_or`` combine, then a control-plane collect of the words.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, num_bits, num_hashes))).alias("pos")
    masks = (
        keys.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.element_at(
                F.lit(_POW2), (F.col("pos") % 64).cast("int") + 1
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
        .collect()
    )
    words = [0] * n_words
    for row in masks:
        words[row["word_idx"]] = row["word"]
    return words


def might_contain(
    words: list[int],
    key: Column,
    num_hashes: int = 3,
) -> Column:
    """True iff every hash position of ``key`` is set in ``words`` —
    i.e. the key MIGHT be in the set (false positives possible, false
    negatives not). Pure Column expression over two literal arrays."""
    num_bits = len(words) * 64
    checks = []
    for pos in _positions(key, num_bits, num_hashes):
        word = F.element_at(F.lit(words), (pos / 64).cast("int") + 1)
        mask = F.element_at(F.lit(_POW2), (pos % 64).cast("int") + 1)
        checks.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, checks)


def bloom_anti_join(
    probe: DataFrame,
    keys: DataFrame,
    probe_key: str,
    keys_key: str,
    num_bits: int = 65536,
    num_hashes: int = 3,
) -> DataFrame:
    """EXACT anti-join with a Bloom prefilter: rows whose key is
    definitely not in ``keys`` are kept map-side without ever entering a
    join; only possible-members shuffle into the exact anti-join that
    resolves the false positives. Equivalent to
    ``probe.join(keys, probe[k] == keys[k], "left_anti")`` row-for-row.
    """
    words = build_bloom(keys, keys_key, num_bits, num_hashes)
    maybe = might_contain(words, F.col(probe_key), num_hashes)
    definite_out = probe.filter(~maybe)
    resolved = probe.filter(maybe).join(
        keys.select(keys_key),
        probe[probe_key] == keys[keys_key],
        "left_anti",
    )
    return definite_out.unionByName(resolved)
