"""IMA-ADPCM decoder vs an INDEPENDENT encoder + the fixture contract.

The fixture (make_adpcm_payload) only emits one block with a fixed
nibble pattern; the encoder here drives the decoder's general paths —
multi-block files, predictor clamping near the int16 rails, short
samples-per-block with ignored trailing nibbles, fact-chunk truncation —
none of which the oracle can reach. The reference samples come from the
encoder's own reconstruction track (an IMA encoder predicts with the
decoder's arithmetic, so encode->decode must be bit-exact), giving a
comparison independent of operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM

# spec tables, written out independently of the production module
_STEP = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IDX = [-1, -1, -1, -1, 2, 4, 6, 8]


def _enc_nibble(sample: int, pred: int, index: int):
    """Spec IMA encoder step: returns (nibble, new_pred, new_index) with
    new_pred being the decoder-identical reconstruction."""
    step = _STEP[index]
    delta = sample - pred
    n = 0
    if delta < 0:
        n = 8
        delta = -delta
    diff = step >> 3
    if delta >= step:
        n |= 4
        delta -= step
        diff += step
    if delta >= step >> 1:
        n |= 2
        delta -= step >> 1
        diff += step >> 1
    if delta >= step >> 2:
        n |= 1
        diff += step >> 2
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IDX[n & 7]))
    return n, pred, index


def _encode_ima_wav(samples, spb, pad_nibbles=0, fact=None, init_index=0):
    """Minimal spec-conforming IMA-ADPCM WAV encoder: blocks of `spb`
    samples (header sample + spb-1 nibbles), optional garbage trailing
    nibbles a decoder must ignore, optional fact override. Returns
    (wav_bytes, reconstructed_samples)."""
    n_nib_bytes = (spb - 1 + pad_nibbles + 1) // 2
    block_align = 4 + n_nib_bytes
    blocks, recon = b"", []
    index = init_index
    for b0 in range(0, len(samples), spb):
        chunk = samples[b0 : b0 + spb]
        pred = int(chunk[0])
        start_index = index  # header records the index at block START
        recon.append(pred)
        nibs = []
        for s in chunk[1:]:
            n, pred, index = _enc_nibble(int(s), pred, index)
            nibs.append(n)
            recon.append(pred)
        nibs += [0xF] * (2 * n_nib_bytes - len(nibs))  # pad/garbage
        packed = bytes(
            nibs[i] | (nibs[i + 1] << 4) for i in range(0, len(nibs), 2)
        )
        blocks += struct.pack("<hBB", int(chunk[0]), start_index, 0) + packed
    total = fact if fact is not None else len(recon)
    fmt = struct.pack(
        "<4sIHHIIHHHH", b"fmt ", 20, 0x11, 1, 8000,
        8000 * block_align // spb, block_align, 4, 2, spb,
    )
    fact_c = struct.pack("<4sII", b"fact", 4, total)
    data = struct.pack("<4sI", b"data", len(blocks)) + blocks
    body = b"WAVE" + fmt + fact_c + data
    return b"RIFF" + struct.pack("<I", len(body)) + body, recon[:total]


def _ramp(n, seed=5):
    """Deterministic wandering int16 sequence spanning both rails."""
    rng = np.random.default_rng(seed)
    steps = rng.integers(-9000, 9000, size=n)
    vals = np.clip(np.cumsum(steps) + rng.integers(-20000, 20000), -32768, 32767)
    return vals.astype(np.int64)


def test_adpcm_decode_matches_independent_encoder_multiblock():
    """Three blocks of 33 samples through the spec encoder: the decoder
    must reproduce the encoder's own reconstruction exactly, including
    predictor clamping near the rails."""
    samples = _ramp(99)
    blob, recon = _encode_ima_wav(samples.tolist(), spb=33)
    got = MM._parse_adpcm_wav(blob)
    assert got is not None
    assert got.tolist() == recon


def test_adpcm_trailing_nibbles_ignored_and_fact_truncates():
    """spb smaller than block capacity: garbage trailing nibbles must
    not decode; a fact chunk below the decoded total truncates."""
    samples = _ramp(20, seed=9)
    blob, recon = _encode_ima_wav(
        samples.tolist(), spb=10, pad_nibbles=5, fact=17
    )
    got = MM._parse_adpcm_wav(blob)
    assert got is not None
    assert got.tolist() == recon  # recon already fact-truncated to 17
    assert len(got) == 17


def test_adpcm_rejects_malformed():
    samples = _ramp(33, seed=2)
    blob, _ = _encode_ima_wav(samples.tolist(), spb=33)
    assert MM._parse_adpcm_wav(blob) is not None
    assert MM._parse_adpcm_wav(b"") is None
    assert MM._parse_adpcm_wav(blob[:30]) is None  # truncated
    # stereo
    bad = bytearray(blob)
    struct.pack_into("<H", bad, blob.index(b"fmt ") + 10, 2)
    assert MM._parse_adpcm_wav(bytes(bad)) is None
    # 8-bit
    bad = bytearray(blob)
    struct.pack_into("<H", bad, blob.index(b"fmt ") + 22, 8)
    assert MM._parse_adpcm_wav(bytes(bad)) is None
    # hostile step index > 88 in the block header
    bad = bytearray(blob)
    bad[blob.index(b"data") + 8 + 2] = 89
    assert MM._parse_adpcm_wav(bytes(bad)) is None
    # data not a multiple of blockAlign
    bad = blob[:-1]
    fixed = bytearray(bad)
    struct.pack_into("<I", fixed, 4, len(bad) - 8)
    struct.pack_into("<I", fixed, blob.index(b"data") + 4, len(blob) - blob.index(b"data") - 9)
    assert MM._parse_adpcm_wav(bytes(fixed)) is None
    # fact larger than what decodes
    blob2, _ = _encode_ima_wav(samples.tolist(), spb=33, fact=1000)
    assert MM._parse_adpcm_wav(blob2) is None


def test_adpcm_fixture_roundtrip_exact(spark, sf_dir):
    """Every sample of every JVM-built fixture blob decodes to
    pred0 + C_k — the contract the oracle replays."""
    from ntd_gtfs_to_socrata_spark.queries.multimodal_q import (
        _adpcm_const_tables,
    )

    _, cl, _, _ = _adpcm_const_tables()
    docs = load_table(spark, sf_dir, "documents").limit(24)
    for r in MM.make_adpcm_payload(docs).collect():
        got = MM._parse_adpcm_wav(bytes(r["payload"]))
        assert got is not None
        pred0 = (r["doc_id"] * 37) % 2048 - 1024
        want = [pred0 + cl[k] for k in range(len(got))]
        assert got.tolist() == want, r["doc_id"]


def test_adpcm_dispatch_routes(spark, sf_dir):
    """dispatch_decode falls through PCM to the ADPCM decoder for
    tag-0x11 RIFF/WAVE blobs."""
    docs = load_table(spark, sf_dir, "documents").limit(4)
    out = MM.dispatch_decode(MM.make_adpcm_payload(docs)).collect()
    assert len(out) == 4
    for row in out:
        assert row["kind"] == "adpcm"
        assert row["n_units"] is not None and row["n_units"] % 2 == 1
        assert row["checksum"] is not None
