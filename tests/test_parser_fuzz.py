"""Errors-as-data under fuzz: no binary parser may RAISE, ever.

The decode UDFs promise ok=False / row-absence for malformed payloads —
a raise fails the whole Spark task, which on a 100 TB heterogeneous lake
means one hostile blob kills the job (the r10 ADVICE failure mode, found
twice by inspection). This test makes the contract mechanical: every
parser is driven with (a) truncations of a VALID payload at every byte
boundary, (b) deterministic single-byte corruptions of a valid payload,
and (c) structured-garbage prefixes — thousands of inputs per format,
all seeded, no Spark session needed. Any exception is a failure; None or
a parsed value are both acceptable outcomes (a corruption that keeps the
payload well-formed may legitimately still parse).
"""

from __future__ import annotations

import random
import zlib

import numpy as np

from ntd_gtfs_to_socrata_spark.operators import multimodal as MM


def _valid_png() -> bytes:
    import struct

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    w, h = 3, 2
    rows = b""
    for r in range(h):
        rows += bytes([0]) + bytes((7 * r + j) % 256 for j in range(w * 3))
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )


def _valid_blobs(spark_free: bool = True) -> dict:
    """One valid payload per format, built without a Spark session where
    possible (PNG/JPEG via the tests' own encoders, BMP/WAV/AVI via a
    deterministic in-test construction mirroring the fixtures)."""
    from tests.test_jpeg_decode import STD_Q, _encode_jpeg, _gray_plane

    jpeg, _ = _encode_jpeg([_gray_plane(5, 8, 16)], [(1, 1)], {0: STD_Q}, [0])

    import struct
    import wave as wave_mod
    import io

    buf = io.BytesIO()
    wf = wave_mod.open(buf, "wb")
    wf.setnchannels(1)
    wf.setsampwidth(2)
    wf.setframerate(8000)
    wf.writeframes(struct.pack("<8h", *range(-4, 4)))
    wf.close()
    wav = buf.getvalue()

    # minimal 24-bpp BMP, 2x2
    px = bytes(range(12)) + b"\x00" * 0
    rows = px[:6] + b"\x00\x00" + px[6:] + b"\x00\x00"
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 0, 0, 0, 0)
        + rows
    )
    from tests.test_adpcm import _encode_ima_wav, _ramp

    adpcm, _ = _encode_ima_wav(_ramp(66).tolist(), spb=33)
    from tests.test_gif_decode import _build_gif
    from tests.test_mulaw_decode import _encode_mulaw_wav

    gif = _build_gif(5, 4, list(range(8)) * 2 + [3] * 4, interlace=True)
    mulaw = _encode_mulaw_wav([(37 * i) % 256 for i in range(33)])
    return {
        "png": _valid_png(),
        "jpeg": jpeg,
        "wav": wav,
        "bmp": bmp,
        "avi": _valid_avi(),
        "adpcm": adpcm,
        "gif": gif,
        "mulaw": mulaw,
    }


def _valid_avi() -> bytes:
    """Minimal hand-built RIFF-AVI the production parser accepts: hdrl
    (avih + strl/strh 'vidsDIB ' + strf 24-bpp) and a movi LIST with two
    2x1 bottom-up DIB frames — so truncation/corruption fuzz reaches the
    deep header-validation and frame-decode paths."""
    import struct

    w, h, n_frames = 2, 1, 2

    def chunk(fourcc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind, data):
        return chunk(b"LIST", kind + data)

    avih = bytearray(56)
    struct.pack_into("<I", avih, 16, n_frames)
    struct.pack_into("<II", avih, 32, w, h)
    strh = b"vidsDIB " + b"\x00" * 48
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 8, 0, 0, 0, 0)
    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", bytes(avih)) + strl)
    stride = ((w * 3 + 3) // 4) * 4
    frames = b"".join(
        chunk(b"00db", bytes((f * 31 + j) % 256 for j in range(stride * h)))
        for f in range(n_frames)
    )
    movi = lst(b"movi", frames)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


PARSERS = {
    "png": MM._parse_png,
    "jpeg": MM._parse_jpeg,
    "wav": MM._parse_wav,
    "bmp": MM._parse_bmp,
    "avi": MM._parse_avi,
    "adpcm": MM._parse_adpcm_wav,
    "gif": MM._parse_gif,
    "mulaw": MM._parse_mulaw_wav,
}


def test_parsers_never_raise_on_truncations_and_corruptions():
    blobs = _valid_blobs()
    rng = random.Random(0xC0FFEE)
    for kind, parser in PARSERS.items():
        base = blobs[kind]
        assert parser(bytes(base)) is not None, f"{kind} base blob invalid"
        # every truncation point
        for i in range(len(base)):
            parser(base[:i])
        # 500 deterministic single-byte corruptions
        for _ in range(500):
            pos = rng.randrange(len(base))
            mut = bytearray(base)
            mut[pos] ^= 1 << rng.randrange(8)
            parser(bytes(mut))
        # 200 random tails after a valid magic prefix
        magic = base[:12]
        for _ in range(200):
            tail = bytes(rng.randrange(256) for _ in range(rng.randrange(64)))
            parser(magic + tail)


def test_parsers_never_raise_on_pure_garbage():
    rng = np.random.default_rng(7)
    for _, parser in PARSERS.items():
        for n in (0, 1, 7, 64, 513):
            for _ in range(50):
                parser(rng.integers(0, 256, size=n, dtype=np.uint8).tobytes())
