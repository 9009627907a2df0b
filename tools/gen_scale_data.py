"""Deterministic scale-up of a testdata sf dir (r7 verdict item 2).

Replicates every table ``factor`` times with disjoint key spaces so the
result is ``factor`` self-consistent shards of the source star schema:

- fact/dim keys get a per-replica stride offset (joins stay intact, no
  cross-replica edges appear);
- ``documents.text`` tokens are prefixed ``r{K}_`` for replica K>0 — a
  bijection on shingles, so the near-dup/cluster structure of each
  replica is EXACTLY the source's and nothing matches across replicas
  (cluster counts scale linearly by construction);
- ``embeddings.embedding`` gets small deterministic per-replica jitter
  (seeded by replica index) so vectors are near but not identical across
  replicas — a 10x corpus, not 10 exact copies of each vector;
- ``region``/``nation`` are constant dimensions and stay as-is.

Replica 0 is the identity, so the output strictly contains the source.
Pure pyarrow/numpy (no Spark session): physical parquet types are
preserved, output is a deterministic function of (source, factor).

Usage: python tools/gen_scale_data.py SRC_DIR OUT_DIR FACTOR
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> per-replica stride (disjoint ranges for any factor <= 100)
STRIDES = {
    "c_custkey": 10_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 10_000_000,
    "o_orderkey": 100_000_000,
    "o_custkey": 10_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 10_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

CONSTANT_DIMS = {"region", "nation"}
ROW_GROUP = 262_144  # ~24 row groups for sf1 lineitem: scan parallelism


def _shift_keys(tbl: pa.Table, k: int) -> pa.Table:
    for name, stride in STRIDES.items():
        if name in tbl.column_names:
            i = tbl.schema.get_field_index(name)
            col = pc.add(tbl.column(name), pa.scalar(k * stride, tbl.schema.field(i).type))
            tbl = tbl.set_column(i, tbl.schema.field(i), col)
    return tbl


def _prefix_doc_text(tbl: pa.Table, k: int) -> pa.Table:
    texts = tbl.column("text").to_pylist()
    pref = f"r{k}_"
    new = [" ".join(pref + t for t in s.split()) for s in texts]
    i = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(i, tbl.schema.field(i), pa.array(new, tbl.schema.field(i).type))
    if "n_chars" in tbl.column_names:
        j = tbl.schema.get_field_index("n_chars")
        lens = pa.array([len(s) for s in new], tbl.schema.field(j).type)
        tbl = tbl.set_column(j, tbl.schema.field(j), lens)
    return tbl


def _jitter_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    i = tbl.schema.get_field_index("embedding")
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    rng = np.random.RandomState(1_000 + k)  # deterministic per replica
    vecs = vecs + rng.normal(0.0, 0.05, size=vecs.shape).astype(np.float32)
    arr = pa.array(list(vecs), type=tbl.schema.field(i).type)
    return tbl.set_column(i, tbl.schema.field(i), arr)


def scale_table(name: str, src: str, out: str, factor: int) -> int:
    tbl = pq.read_table(os.path.join(src, f"{name}.parquet"))
    if name in CONSTANT_DIMS:
        reps = [tbl]
    else:
        reps = []
        for k in range(factor):
            r = _shift_keys(tbl, k)
            if name == "documents" and k > 0:
                r = _prefix_doc_text(r, k)
            if name == "embeddings" and k > 0:
                r = _jitter_embeddings(r, k)
            reps.append(r)
    big = pa.concat_tables(reps)
    pq.write_table(big, os.path.join(out, f"{name}.parquet"), row_group_size=ROW_GROUP)
    return big.num_rows


def main() -> None:
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        n = scale_table(name, src, out, factor)
        print(f"{name}: {n} rows")


if __name__ == "__main__":
    main()
