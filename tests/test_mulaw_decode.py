"""G.711 mu-law decoder vs an INDEPENDENT reference + fixture contract.

The reference expansion table here is built the spec's way — segment
edges via the encoder's bias-and-shift construction — entirely apart
from the production formula, so the two can only agree if both implement
ITU-T G.711. Container tests drive the RIFF walk (extended fmt, fact
truncation, odd-length pad) the closed-form oracle also exercises.
"""

from __future__ import annotations

import struct

import numpy as np

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM

_BIAS = 0x84


def _ref_table() -> list:
    """Reference mu-law DECODE table via the encode-side construction:
    for each code, segment s and mantissa m reconstruct the quantization
    interval midpoint (2m+33) << s minus the bias — the classic CCITT
    table (max +-32124, codes 0x7F/0xFF decode to 0)."""
    out = []
    for code in range(256):
        u = ~code & 0xFF
        s = (u >> 4) & 7
        m = u & 0x0F
        mag = ((2 * m + 33) << s) - 33  # interval midpoint, bias removed
        out.append(-4 * mag if u & 0x80 else 4 * mag)
    return out


def test_expansion_matches_reference_table_all_256_codes():
    got = MM._mulaw_expand(np.arange(256, dtype=np.uint8))
    ref = _ref_table()
    assert got.tolist() == ref
    # spec anchors
    assert got[0x00] == -32124 and got[0x80] == 32124
    assert got[0x7F] == 0 and got[0xFF] == 0
    # odd symmetry between sign halves
    assert (got[:128] == -got[128:]).all()
    # magnitude decreases monotonically within each sign half
    assert (np.diff(got[:128]) > 0).all()
    assert (np.diff(got[128:]) < 0).all()


def _encode_mulaw_wav(codes, fact=None, extended=True):
    n = len(codes)
    fmt_body = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    if extended:
        fmt_body += struct.pack("<H", 0)
    fmt = struct.pack("<4sI", b"fmt ", len(fmt_body)) + fmt_body
    fact_c = (
        struct.pack("<4sII", b"fact", 4, fact if fact is not None else n)
    )
    data = struct.pack("<4sI", b"data", n) + bytes(codes)
    if n % 2:
        data += b"\x00"
    body = b"WAVE" + fmt + fact_c + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_container_roundtrip_including_odd_length_pad():
    for n in (5, 8):  # odd (padded) and even
        codes = [(37 * i) % 256 for i in range(n)]
        got = MM._parse_mulaw_wav(_encode_mulaw_wav(codes))
        assert got is not None and len(got) == n
        want = MM._mulaw_expand(np.array(codes, dtype=np.uint8))
        assert got.tolist() == want.tolist()


def test_fact_truncates_and_rejects_overclaim():
    codes = list(range(10))
    got = MM._parse_mulaw_wav(_encode_mulaw_wav(codes, fact=7))
    assert got is not None and len(got) == 7
    assert MM._parse_mulaw_wav(_encode_mulaw_wav(codes, fact=11)) is None


def test_rejects_malformed():
    codes = list(range(16))
    blob = _encode_mulaw_wav(codes)
    assert MM._parse_mulaw_wav(blob) is not None
    assert MM._parse_mulaw_wav(b"") is None
    assert MM._parse_mulaw_wav(blob[:20]) is None
    # stereo
    bad = bytearray(blob)
    struct.pack_into("<H", bad, blob.index(b"fmt ") + 10, 2)
    assert MM._parse_mulaw_wav(bytes(bad)) is None
    # 16-bit claims mu-law tag
    bad = bytearray(blob)
    struct.pack_into("<H", bad, blob.index(b"fmt ") + 22, 16)
    assert MM._parse_mulaw_wav(bytes(bad)) is None
    # PCM tag must not route here
    bad = bytearray(blob)
    struct.pack_into("<H", bad, blob.index(b"fmt ") + 8, 1)
    assert MM._parse_mulaw_wav(bytes(bad)) is None
    # 16-byte (non-extended) fmt is also legal
    assert (
        MM._parse_mulaw_wav(_encode_mulaw_wav(codes, extended=False))
        is not None
    )


def test_mulaw_fixture_roundtrip_exact(spark, sf_dir):
    """Every sample of every JVM-built fixture blob decodes to the
    formula the oracle replays."""
    docs = load_table(spark, sf_dir, "documents").limit(24)
    for r in MM.make_mulaw_payload(docs).collect():
        got = MM._parse_mulaw_wav(bytes(r["payload"]))
        assert got is not None, r["doc_id"]
        nb = len(got)
        codes = (r["doc_id"] * 13 + 7 * np.arange(nb, dtype=np.int64)) % 256
        want = MM._mulaw_expand(codes.astype(np.uint8))
        assert got.tolist() == want.tolist(), r["doc_id"]


def test_mulaw_dispatch_routes(spark, sf_dir):
    """dispatch_decode falls through PCM -> ADPCM -> mu-law on the fmt
    tag for RIFF/WAVE blobs."""
    docs = load_table(spark, sf_dir, "documents").limit(4)
    out = MM.dispatch_decode(MM.make_mulaw_payload(docs)).collect()
    assert len(out) == 4
    for row in out:
        assert row["kind"] == "mulaw"
        assert row["n_units"] is not None and 40 <= row["n_units"] < 160
        assert row["checksum"] is not None
