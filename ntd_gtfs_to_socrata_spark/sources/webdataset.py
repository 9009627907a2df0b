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

At 100 TB the shard build's groupBy is bounded by SHARD_SIZE (docs per
shard is a constant, shard count grows with the corpus), and ingest
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


def _make_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """One tar blob per shard group: {doc_id}.txt (payload bytes) +
    {doc_id}.json (metadata), members sorted by doc_id, mtime pinned to 0
    — shard bytes are a deterministic function of the group."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for _, row in pdf.sort_values("doc_id").iterrows():
            txt = str(row["text"]).encode("utf-8")
            meta = json.dumps(
                {"lang": row["lang"], "source": row["source"]}, sort_keys=True
            ).encode("utf-8")
            for name, data in (
                (f"{int(row['doc_id'])}.txt", txt),
                (f"{int(row['doc_id'])}.json", meta),
            ):
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(data))
    return pd.DataFrame(
        [[int(pdf["shard_id"].iloc[0]), buf.getvalue(), 2 * len(pdf)]],
        columns=["shard_id", "tar", "n_members"],
    )


def build_webdataset_shards(docs: DataFrame, n_shards_hint: int | None = None) -> DataFrame:
    """documents -> (shard_id, tar, n_members): the corpus-to-shards
    write path. Shard key is doc_id-derived (pmod), so placement is
    deterministic and re-runnable; the groupBy is THE shuffle the format
    implies and each group is SHARD_DOCS-bounded."""
    n_shards = n_shards_hint or max(
        1, docs.selectExpr("count(*) AS n").first()["n"] // SHARD_DOCS
    )
    keyed = docs.select(
        "doc_id", "text", "lang", "source",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("shard_id"),
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
                meta = json.loads(parts["json"])
                out.append(
                    (int(key), len(parts["txt"]), meta.get("lang"), len(parts))
                )
        yield pd.DataFrame(
            out, columns=["doc_id", "n_bytes", "lang", "n_members"]
        )


def parse_webdataset(shards: DataFrame) -> DataFrame:
    """Map-side shard ingest: one output row per complete sample."""
    return shards.select("tar").mapInPandas(
        parse_webdataset_batch, schema=SAMPLE_SCHEMA
    )
