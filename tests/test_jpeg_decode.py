"""Baseline-JPEG decoder vs an INDEPENDENT numpy DCT encoder.

The fixture (make_jpeg_payload) only emits DC-only / single-AC blocks
through custom uniform Huffman tables; the encoder here drives the
decoder's general paths — dense AC spectra, ZRL runs, restart markers,
multi-table DHT, and a 4:2:0 three-component color frame — none of which
the oracle can reach. The reference pixels come from numpy's own
dequantize+IDCT of the quantized coefficients, so the comparison checks
the decoder's entropy decode, dezigzag, dequant, and IDCT bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM

# --- tiny independent encoder --------------------------------------------
# Huffman design: DC categories 0..11 as 4-bit codes 0..11; AC symbols
# 0..255 as 9-bit codes equal to their own value (canonical: no shorter
# codes exist, so the first length-9 code is 0). Both are valid DHT
# payloads any baseline decoder must accept.

_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_DC_SYMS = bytes(range(12))
_AC_COUNTS = bytes([0] * 8 + [255] + [1] + [0] * 6)  # 255 at len 9 + 1 at len 10
_AC_SYMS = bytes(range(256))


def _ac_code(sym: int):
    """Canonical codes for _AC_COUNTS: symbols 0..254 are the 9-bit codes
    0..254; symbol 255 is the 10-bit code 510 (= 255 << 1)."""
    if sym < 255:
        return sym, 9
    return 255 << 1, 10


def _dct_block(block):
    a = MM._jpeg_idct_matrix()
    return a @ (block.astype(np.float64) - 128.0) @ a.T


def _idct_block(coefs):
    a = MM._jpeg_idct_matrix()
    return a.T @ coefs @ a + 128.0


class _BitWriter:
    def __init__(self):
        self.bits = []

    def write(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = int("".join(map(str, bits[i : i + 8])), 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _encode_block(writer, qcoefs_zz, prev_dc):
    """Quantized coefficients in zigzag order -> bitstream."""
    diff = int(qcoefs_zz[0]) - prev_dc
    cat = int(abs(diff)).bit_length()
    writer.write(cat, 4)
    if cat:
        writer.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    k = 1
    while k <= 63:
        run = 0
        while k <= 63 and qcoefs_zz[k] == 0:
            run += 1
            k += 1
        if k > 63:
            code, n = _ac_code(0x00)  # EOB
            writer.write(code, n)
            break
        while run >= 16:
            code, n = _ac_code(0xF0)  # ZRL
            writer.write(code, n)
            run -= 16
        v = int(qcoefs_zz[k])
        size = abs(v).bit_length()
        code, n = _ac_code((run << 4) | size)
        writer.write(code, n)
        writer.write(v if v > 0 else v + (1 << size) - 1, size)
        k += 1
    return int(qcoefs_zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt(tq, table64_zz):
    return _seg(0xDB, bytes([tq]) + bytes(int(x) for x in table64_zz))


def _dht(tc, th, counts, syms):
    return _seg(0xC4, bytes([(tc << 4) | th]) + counts + syms)


def _quantize_planes(planes, samps, qtables, tqs):
    """Returns per-component list of (block_y, block_x, qcoefs_zz) in
    block-raster order plus the reference reconstructed planes."""
    zz = MM._JPEG_ZIGZAG
    out, recon = [], []
    for plane, q in zip(planes, (qtables[t] for t in tqs)):
        h, w = plane.shape
        qmat = np.zeros((8, 8))
        for z in range(64):
            qmat[divmod(zz[z], 8)] = q[z]
        blocks, rplane = [], np.zeros_like(plane, dtype=np.float64)
        for by in range(h // 8):
            for bx in range(w // 8):
                blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                qc = np.round(_dct_block(blk) / qmat).astype(np.int64)
                zzc = np.array([qc[divmod(zz[z], 8)] for z in range(64)])
                blocks.append((by, bx, zzc))
                rplane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_block(
                    qc * qmat
                )
        out.append(blocks)
        recon.append(rplane)
    return out, recon


def _encode_jpeg(planes, samps, qtables, tqs, restart_interval=0):
    """Minimal but spec-conforming baseline encoder: interleaved MCUs,
    optional DRI/RSTn. planes[i] shape must be a multiple of 8 and
    consistent with samps[i]=(h,v). Returns (bytes, reference_planes)."""
    nc = len(planes)
    hmax = max(h for h, _ in samps)
    vmax = max(v for _, v in samps)
    h0, w0 = planes[0].shape
    # image dims = component-0 plane dims * (max / its sampling factor)
    img_w = w0 * hmax // samps[0][0]
    img_h = h0 * vmax // samps[0][1]
    blocks, recon = _quantize_planes(planes, samps, qtables, tqs)
    sof = bytes([8]) + img_h.to_bytes(2, "big") + img_w.to_bytes(2, "big")
    sof += bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (samps[i][0] << 4) | samps[i][1], tqs[i]])
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0 for all
    sos += bytes([0, 63, 0])
    out = b"\xff\xd8"
    seen = set()
    for t in tqs:
        if t not in seen:
            out += _dqt(t, qtables[t])
            seen.add(t)
    out += _dht(0, 0, _DC_COUNTS, _DC_SYMS) + _dht(1, 0, _AC_COUNTS, _AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += _seg(0xC0, sof) + _seg(0xDA, sos)
    mcux = img_w // (8 * hmax)
    mcuy = img_h // (8 * vmax)
    writer = _BitWriter()
    prev = [0] * nc
    ent = b""
    mcu_no, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                ent += writer.tobytes() + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                writer = _BitWriter()
                prev = [0] * nc
            mcu_no += 1
            for ci in range(nc):
                hi, vi = samps[ci]
                for by in range(vi):
                    for bx in range(hi):
                        bby, bbx = my * vi + by, mx * hi + bx
                        zzc = next(
                            z for (y, x, z) in blocks[ci] if (y, x) == (bby, bbx)
                        )
                        prev[ci] = _encode_block(writer, zzc, prev[ci])
    ent += writer.tobytes()
    out += ent + b"\xff\xd9"
    return out, recon


def _ref_pixels(recon, samps, img_w, img_h):
    hmax = max(h for h, _ in samps)
    vmax = max(v for _, v in samps)
    ups = []
    for plane, (hi, vi) in zip(recon, samps):
        ys = (np.arange(img_h) * vi) // vmax
        xs = (np.arange(img_w) * hi) // hmax
        ups.append(plane[np.ix_(ys, xs)])
    if len(ups) == 1:
        return np.clip(np.floor(ups[0] + 0.5), 0, 255).astype(np.int64)
    y, cb, cr = ups[0], ups[1] - 128.0, ups[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.int64)


def _gray_plane(seed, h, w):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.int64)


STD_Q = bytes(
    [16, 11, 10, 16, 24, 40, 51, 61] + [12] * 56
)  # arbitrary non-uniform zigzag table


def test_jpeg_decode_matches_independent_encoder_grayscale():
    """Dense random blocks through a non-uniform quant table: exercises
    multi-coefficient AC decode, ZRL (random data rarely needs it, so one
    block is planted with a 17-zero gap), and the full IDCT."""
    plane = _gray_plane(7, 16, 24)
    blob, recon = _encode_jpeg([plane], [(1, 1)], {0: STD_Q}, [0])
    parsed = MM._parse_jpeg(blob)
    assert parsed is not None
    w, h, img = parsed
    assert (w, h) == (24, 16)
    ref = _ref_pixels(recon, [(1, 1)], 24, 16)
    assert (img == ref).all()


def test_jpeg_decode_zrl_path():
    """A hand-built coefficient block with a >16-zero gap forces the ZRL
    (0xF0) symbol through the encoder and decoder."""
    zz = MM._JPEG_ZIGZAG
    qc = np.zeros((8, 8))
    qc[divmod(zz[0], 8)] = 4  # DC
    qc[divmod(zz[20], 8)] = 3  # 19 zeros before it -> ZRL + run 3
    q = bytes([8] * 64)
    qmat = np.full((8, 8), 8.0)
    # build pixels whose DCT quantizes to exactly qc: IDCT(qc*q) rounded
    block = np.clip(np.floor(_idct_block(qc * qmat) + 0.5), 0, 255)
    blob, recon = _encode_jpeg([block.astype(np.int64)], [(1, 1)], {0: q}, [0])
    # the planted coefficient must survive the round trip
    parsed = MM._parse_jpeg(blob)
    assert parsed is not None
    w, h, img = parsed
    ref = _ref_pixels(recon, [(1, 1)], 8, 8)
    assert (img == ref).all()
    assert img.std() > 0  # the AC coefficient actually shaped the block


def test_jpeg_decode_restart_markers():
    """DRI + RSTn every MCU: predictors reset and the bitstream realigns
    at each marker — decoded pixels must still match the reference."""
    plane = _gray_plane(11, 8, 32)  # 4 MCUs across
    blob, recon = _encode_jpeg(
        [plane], [(1, 1)], {0: STD_Q}, [0], restart_interval=1
    )
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    parsed = MM._parse_jpeg(blob)
    assert parsed is not None
    w, h, img = parsed
    ref = _ref_pixels(recon, [(1, 1)], 32, 8)
    assert (img == ref).all()


def test_jpeg_decode_color_420():
    """3-component 4:2:0 frame (Y 2x2, Cb/Cr 1x1): interleaved-MCU order,
    per-component predictors, chroma upsampling, YCbCr->RGB."""
    y = _gray_plane(3, 16, 32)
    cb = _gray_plane(4, 8, 16)
    cr = _gray_plane(5, 8, 16)
    samps = [(2, 2), (1, 1), (1, 1)]
    blob, recon = _encode_jpeg([y, cb, cr], samps, {0: STD_Q}, [0, 0, 0])
    parsed = MM._parse_jpeg(blob)
    assert parsed is not None
    w, h, img = parsed
    assert (w, h) == (32, 16)
    assert img.shape == (16, 32, 3)
    ref = _ref_pixels(recon, samps, 32, 16)
    assert (img == ref).all()


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows runs of 0xFF fill bytes before any marker —
    conformant encoders pad both between header segments and before
    RSTn/EOI in the entropy stream. The decoder must skip them (r11
    ADVICE: they previously parsed as a bad marker -> ok=False)."""
    plane = _gray_plane(13, 8, 32)
    blob, recon = _encode_jpeg(
        [plane], [(1, 1)], {0: STD_Q}, [0], restart_interval=1
    )
    ref = _ref_pixels(recon, [(1, 1)], 32, 8)
    # fill before a header segment marker (after SOI) ...
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]
    # ... and before every restart marker and the EOI in the scan
    for rst in range(8):
        padded = padded.replace(bytes([0xFF, 0xD0 + rst]), bytes([0xFF, 0xFF, 0xD0 + rst]))
    padded = padded[:-2] + b"\xff" + padded[-2:]
    parsed = MM._parse_jpeg(padded)
    assert parsed is not None
    w, h, img = parsed
    assert (w, h) == (32, 8)
    assert (img == ref).all()


def test_jpeg_parse_rejects_malformed_payloads():
    plane = _gray_plane(2, 8, 8)
    blob, _ = _encode_jpeg([plane], [(1, 1)], {0: STD_Q}, [0])
    assert MM._parse_jpeg(blob) is not None
    assert MM._parse_jpeg(b"") is None
    assert MM._parse_jpeg(b"\xff\xd8") is None  # SOI only
    assert MM._parse_jpeg(blob[:-4]) is None  # truncated entropy, no EOI
    # declared segment length past the buffer
    assert MM._parse_jpeg(b"\xff\xd8\xff\xdb\xff\xff\x00") is None
    # progressive SOF2 must be rejected, not mis-decoded
    prog = blob.replace(b"\xff\xc0", b"\xff\xc2")
    assert MM._parse_jpeg(prog) is None
    # hostile SOF dims: cap rejects before any allocation
    sof_at = blob.index(b"\xff\xc0")
    hostile = bytearray(blob)
    struct.pack_into(">HH", hostile, sof_at + 5, 0xFFFF, 0xFFFF)
    assert MM._parse_jpeg(bytes(hostile)) is None
    # truncated mid-entropy with valid EOI appended: the Huffman reader
    # hits EOF or garbage — either way it must return (None or a value),
    # never raise out of the task
    cut = blob[: len(blob) - 6] + b"\xff\xd9"
    MM._parse_jpeg(cut)


def test_jpeg_fixture_roundtrip_exact(spark, sf_dir):
    """Every pixel of every JVM-built fixture JPEG decodes to the
    construction formula (the contract the oracle replays)."""
    docs = load_table(spark, sf_dir, "documents").limit(24)
    dlt = np.array(MM._JPEG_AC_DELTAS)
    for r in MM.make_jpeg_payload(docs).collect():
        parsed = MM._parse_jpeg(bytes(r["payload"]))
        assert parsed is not None
        w, h, img = parsed
        nbx = w // 8
        assert h == 8 * MM.JPEG_BLOCKS_Y
        for k in range(nbx * MM.JPEG_BLOCKS_Y):
            by, bx = divmod(k, nbx)
            v = 32 + (r["doc_id"] + 37 * k) % 192
            blk = np.full((8, 8), v)
            if k % 2 == 1:
                blk = blk + (1 if v % 2 == 0 else -1) * dlt
            got = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert (got == blk).all(), (r["doc_id"], k)


def test_jpeg_dispatch_routes_jpeg(spark, sf_dir):
    """dispatch_decode sniffs FFD8 and runs the real JPEG decoder."""
    docs = load_table(spark, sf_dir, "documents").limit(4)
    out = MM.dispatch_decode(MM.make_jpeg_payload(docs)).collect()
    assert len(out) == 4
    for row in out:
        assert row["kind"] == "jpeg"
        assert row["n_units"] is not None and row["n_units"] % 128 == 0
        assert row["checksum"] > 0


def test_jpeg_resize_matches_independent_nn_reference(spark, sf_dir):
    """The fused decode+resize against an independent reference: decode
    with _parse_jpeg directly, resample with the same floor convention,
    compare every thumbnail pixel."""
    from ntd_gtfs_to_socrata_spark.operators.multimodal import (
        RESIZE_H,
        RESIZE_W,
        make_jpeg_payload,
        resize_jpeg,
    )

    docs = load_table(spark, sf_dir, "documents").limit(12)
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in make_jpeg_payload(docs).collect()
    }
    got = {
        (r["doc_id"], r["x"], r["y"]): r["px"]
        for r in resize_jpeg(make_jpeg_payload(docs)).collect()
    }
    assert len(got) == len(payloads) * RESIZE_W * RESIZE_H
    for doc_id, blob in payloads.items():
        w, h, img = MM._parse_jpeg(blob)
        for y in range(RESIZE_H):
            for x in range(RESIZE_W):
                sx, sy = (x * w) // RESIZE_W, (y * h) // RESIZE_H
                assert got[(doc_id, x, y)] == int(img[sy, sx])
