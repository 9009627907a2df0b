"""WebDataset-style tar-shard codec (north-star extension; no reference
analog — the reference's only archive handling is the serial zip-member
read at publish_to_catalog.py:316-325).

WebDataset is the de-facto container for large-scale multimodal training
corpora: samples live in plain tar shards, one file per modality per
sample, grouped by the members' shared basename ("10027.txt" +
"10027.json" [+ "10027.jpg" ...] = one sample), shards streamed
sequentially by loaders. Both directions here are REAL stdlib ``tarfile``
round-trips through genuine ustar bytes:

- SHARD BUILD is the one shuffle the format implies — group docs by
  shard key, ``applyInPandas`` writes each group into one tar blob
  (member order and mtimes pinned so shard bytes are deterministic).
- INGEST is map-side: each task opens its partition's shards, walks tar
  members, groups by sample key, JSON-decodes the metadata member.

At 100 TB the shard build's groupBy distributes by a HASH of doc_id
(uniform for any id pattern) and every emitted tar is hard-bounded at
SHARD_DOCS docs (oversized hash groups are chunked), and ingest
parallelizes shard-per-task with zero shuffles — the loader-side
contract WebDataset was designed for.
"""

from __future__ import annotations

import io
import json
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_DOCS = 25  # docs per shard (constant => shard count scales with corpus)
SHARD_SCHEMA = "shard_id long, tar binary, n_members long"
SAMPLE_SCHEMA = "doc_id long, n_bytes long, lang string, n_members long"


_SHARD_SUB = 1 << 20  # composite id space: group_key * _SHARD_SUB + chunk_no


def _make_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """SHARD_DOCS-bounded tar blobs for one shard group: {doc_id}.txt
    (payload bytes) + {doc_id}.json (metadata), members sorted by doc_id,
    mtime pinned to 0 — shard bytes are a deterministic function of the
    group. A group larger than SHARD_DOCS (hash-residue skew) is chunked
    into multiple tars, so every EMITTED shard is hard-bounded regardless
    of the key distribution."""
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    base = int(pdf["shard_id"].iloc[0]) * _SHARD_SUB
    # uniqueness guard (r11 ADVICE): chunk numbers live in the low
    # _SHARD_SUB bits of the composite id — a hash group needing more
    # than 2^20 chunks (~26M docs in ONE residue) would silently collide
    # with the next group's id space. Raise instead: at that skew the
    # group key width is misconfigured, and duplicate shard_ids would
    # corrupt every downstream join on the id.
    if (len(pdf) + SHARD_DOCS - 1) // SHARD_DOCS > _SHARD_SUB:
        raise ValueError(
            f"shard group {int(pdf['shard_id'].iloc[0])} needs more than "
            f"{_SHARD_SUB} chunks ({len(pdf)} docs); composite shard_id "
            "space exhausted — raise n_shards_hint (wider group key)"
        )
    out = []
    for chunk_no, lo in enumerate(range(0, len(pdf), SHARD_DOCS)):
        chunk = pdf.iloc[lo : lo + SHARD_DOCS]
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for _, row in chunk.iterrows():
                txt = str(row["text"]).encode("utf-8")
                meta = json.dumps(
                    {"lang": row["lang"], "source": row["source"]},
                    sort_keys=True,
                ).encode("utf-8")
                for name, data in (
                    (f"{int(row['doc_id'])}.txt", txt),
                    (f"{int(row['doc_id'])}.json", meta),
                ):
                    info = tarfile.TarInfo(name=name)
                    info.size = len(data)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(data))
        out.append([base + chunk_no, buf.getvalue(), 2 * len(chunk)])
    return pd.DataFrame(out, columns=["shard_id", "tar", "n_members"])


def build_webdataset_shards(docs: DataFrame, n_shards_hint: int | None = None) -> DataFrame:
    """documents -> (shard_id, tar, n_members): the corpus-to-shards
    write path. Shard key is a HASH of doc_id (xxhash64 pmod), so
    placement is deterministic/re-runnable AND uniform for any id
    pattern — strided or clustered ids can't pile into one residue the
    way raw pmod(doc_id) allows. The groupBy is THE shuffle the format
    implies; group size is n/n_shards in expectation with Chernoff
    concentration under the hash, and every emitted tar is HARD-bounded
    at SHARD_DOCS docs by the chunking in _make_shard."""
    n_shards = n_shards_hint or max(
        1, docs.selectExpr("count(*) AS n").first()["n"] // SHARD_DOCS
    )
    keyed = docs.select(
        "doc_id", "text", "lang", "source",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_shards)).alias("shard_id"),
    )
    return keyed.groupBy("shard_id").applyInPandas(_make_shard, schema=SHARD_SCHEMA)


def parse_webdataset_batch(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL tar ingest: stdlib tarfile walk per shard, members grouped by
    sample key (basename sans extension), metadata member JSON-decoded.
    Samples missing either member are dropped (errors-as-absence; a
    production loader routes them to a quarantine sink)."""
    for pdf in batches:
        out = []
        for blob in pdf["tar"]:
            try:
                tar = tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:")
            except tarfile.TarError:
                continue
            samples: dict[str, dict[str, bytes]] = {}
            for member in tar.getmembers():
                if not member.isfile() or "." not in member.name:
                    continue
                key, ext = member.name.rsplit(".", 1)
                samples.setdefault(key, {})[ext] = tar.extractfile(member).read()
            for key, parts in samples.items():
                if "txt" not in parts or "json" not in parts:
                    continue
                # Foreign shards carry non-numeric basenames ("readme.txt")
                # and corrupt metadata; both are errors-as-absence, never a
                # ValueError/JSONDecodeError that fails the ingest task.
                try:
                    doc_id = int(key)
                    meta = json.loads(parts["json"])
                except (ValueError, json.JSONDecodeError):
                    continue
                if not isinstance(meta, dict):
                    continue
                out.append(
                    (doc_id, len(parts["txt"]), meta.get("lang"), len(parts))
                )
        yield pd.DataFrame(
            out, columns=["doc_id", "n_bytes", "lang", "n_members"]
        )


def parse_webdataset(shards: DataFrame) -> DataFrame:
    """Map-side shard ingest: one output row per complete sample."""
    return shards.select("tar").mapInPandas(
        parse_webdataset_batch, schema=SAMPLE_SCHEMA
    )
