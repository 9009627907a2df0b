"""GIF/LZW decoder vs an INDEPENDENT encoder + the fixture contract.

The fixture (make_gif_payload) emits only literal root codes with
periodic Clears — every code one byte — so the closed-form oracle can
replay it. The encoder here is a genuine LZW compressor (dictionary
matching, variable-width output with the GIF width-bump schedule, the
4096-entry cap) driving the decoder's general paths the oracle cannot
reach: dictionary-hit codes, width bumps through 512/1024/.../4096,
post-cap emission, the KwKwK case, multi-sub-block reassembly, local
color tables, and the four-pass interlace.
"""

from __future__ import annotations

import struct

import numpy as np

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM


def _lzw_encode(indices, mcs: int) -> bytes:
    """Spec GIF-LZW compressor: leading Clear, greedy longest-match
    dictionary coding, width bump one entry AFTER the table passes
    2^width (the schedule that keeps the decoder — whose table lags the
    encoder's by one entry — in lockstep), stop adding at 4096, final
    code + EOI. Returns the packed LSB-first byte stream."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    codes = [(clear, width)]
    w = b""
    for p in indices:
        c = bytes([int(p)])
        if w + c in table:
            w += c
            continue
        codes.append((table[w], width))
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        w = c
    if w:
        codes.append((table[w], width))
    codes.append((eoi, width))
    acc = n_bits = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << n_bits
        n_bits += cw
        while n_bits >= 8:
            out.append(acc & 255)
            acc >>= 8
            n_bits -= 8
    if n_bits:
        out.append(acc & 255)
    return bytes(out)


def _build_gif(
    w,
    h,
    indices,
    n_pal=16,
    mcs=4,
    interlace=False,
    local_table=False,
    block_size=255,
) -> bytes:
    """Hand-built GIF89a container around an _lzw_encode stream."""
    pal = bytes(v % 256 for i in range(n_pal) for v in (i, 2 * i, 3 * i))
    size_bits = max(0, n_pal.bit_length() - 2)  # 2 << bits == n_pal
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([(0 if local_table else 0x80) | size_bits, 0, 0])
    if not local_table:
        out += pal
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([(0x80 if local_table else 0) | (0x40 if interlace else 0)
                  | (size_bits if local_table else 0)])
    if local_table:
        out += pal
    out += bytes([mcs])
    stream = _lzw_encode(indices, mcs)
    for i in range(0, len(stream), block_size):
        blk = stream[i : i + block_size]
        out += bytes([len(blk)]) + blk
    out += b"\x00\x3b"
    return bytes(out)


def test_lzw_roundtrip_with_dictionary_hits():
    """Genuinely compressible data: the decoder must replay dictionary
    codes, not just literals."""
    rng = np.random.default_rng(11)
    for mcs in (2, 4, 7, 8):
        alpha = 1 << mcs
        base = rng.integers(0, min(alpha, 6), size=40)
        indices = np.tile(base, 8)  # repetition => real dictionary use
        dec = MM._gif_lzw_decode(_lzw_encode(indices, mcs), mcs, len(indices))
        assert dec is not None
        assert list(dec) == indices.tolist(), mcs


def test_lzw_width_bumps_and_table_cap():
    """20k low-alphabet symbols push the table through every width bump
    (512/1024/2048/4096) and past the cap, where both sides must stop
    adding entries and keep emitting existing codes."""
    rng = np.random.default_rng(3)
    indices = rng.integers(0, 4, size=20000)
    stream = _lzw_encode(indices, 2)
    dec = MM._gif_lzw_decode(stream, 2, len(indices))
    assert dec is not None
    assert list(dec) == indices.tolist()


def test_lzw_kwkwk_case():
    """[1,1,1]: the second emitted code equals the next free entry —
    the classic cScSc pattern a naive decoder indexes out of range on."""
    indices = [1, 1, 1]
    dec = MM._gif_lzw_decode(_lzw_encode(indices, 2), 2, 3)
    assert dec is not None and list(dec) == indices


def test_lzw_rejects_malformed():
    indices = list(range(4)) * 10
    stream = _lzw_encode(indices, 2)
    assert MM._gif_lzw_decode(stream[:-2], 2, 40) is None  # no EOI
    assert MM._gif_lzw_decode(b"", 2, 40) is None
    # out-of-range code before the table has grown that far
    assert MM._gif_lzw_decode(bytes([0xFF, 0xFF, 0xFF]), 7, 40) is None


def test_gif_container_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(5)
    for w, h, interlace in ((6, 5, False), (6, 5, True), (3, 10, True)):
        img = rng.integers(0, 14, size=(h, w))
        # file order under interlace = display rows in pass order
        file_rows = (
            img[MM._gif_interlace_order(h)] if interlace else img
        )
        blob = _build_gif(
            w, h, file_rows.reshape(-1), interlace=interlace, block_size=7
        )
        parsed = MM._parse_gif(blob)
        assert parsed is not None
        pw, ph, got, pal = parsed
        assert (pw, ph) == (w, h)
        assert got.tolist() == img.tolist(), (w, h, interlace)
        assert pal.shape == (16, 3)


def test_gif_local_color_table_overrides_global():
    img = np.arange(8).reshape(2, 4)
    blob = _build_gif(4, 2, img.reshape(-1), local_table=True)
    parsed = MM._parse_gif(blob)
    assert parsed is not None
    _, _, got, pal = parsed
    assert got.tolist() == img.tolist()
    assert pal[3].tolist() == [3, 6, 9]


def test_gif_rejects_malformed():
    img = np.arange(8).reshape(2, 4)
    blob = _build_gif(4, 2, img.reshape(-1))
    assert MM._parse_gif(blob) is not None
    assert MM._parse_gif(b"") is None
    assert MM._parse_gif(blob[:20]) is None  # truncated mid-palette
    assert MM._parse_gif(blob[:-3]) is None  # missing terminator+trailer
    # pixel index beyond the palette
    bad = _build_gif(4, 2, [15] * 8, n_pal=8)
    assert MM._parse_gif(bad) is None
    # trailer before any image
    assert MM._parse_gif(blob[:13] + blob[13 : 13 + 48] + b"\x3b") is None
    # hostile LZW min code size
    mut = bytearray(blob)
    mcs_pos = blob.index(bytes([0x2C])) + 10
    mut[mcs_pos] = 12
    assert MM._parse_gif(bytes(mut)) is None


def test_gif_fixture_roundtrip_exact(spark, sf_dir):
    """Every pixel of every JVM-built fixture blob decodes (through LZW,
    sub-block reassembly, and the deinterlace) to (doc_id + 9*k) % 128
    at file position k — the contract the oracle replays."""
    docs = load_table(spark, sf_dir, "documents").limit(24)
    for r in MM.make_gif_payload(docs).collect():
        parsed = MM._parse_gif(bytes(r["payload"]))
        assert parsed is not None, r["doc_id"]
        w, h, img, pal = parsed
        ks = np.arange(w * h, dtype=np.int64)
        file_img = ((r["doc_id"] + 9 * ks) % 128).reshape(h, w)
        disp = np.empty_like(file_img)
        disp[MM._gif_interlace_order(h)] = file_img
        assert img.tolist() == disp.tolist(), r["doc_id"]
        assert pal.tolist() == [
            [(2 * i) % 256, (3 * i) % 256, (5 * i) % 256] for i in range(128)
        ]


def test_gif_dispatch_routes(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(4)
    out = MM.dispatch_decode(MM.make_gif_payload(docs)).collect()
    assert len(out) == 4
    for row in out:
        assert row["kind"] == "gif"
        assert row["n_units"] is not None and 1 <= row["n_units"] <= 35
        assert row["checksum"] is not None
