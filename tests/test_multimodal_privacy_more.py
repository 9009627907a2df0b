"""Pigeonhole completeness of the Hamming-LSH banding and l-diversity
semantics — properties beyond the oracle's value-hash."""

from __future__ import annotations

from pyspark.sql import functions as F

from ntd_gtfs_to_socrata_spark.io import load_table
from ntd_gtfs_to_socrata_spark.operators import multimodal as MM
from ntd_gtfs_to_socrata_spark.queries.multimodal_q import _PHASH_T, mm_phash_neardup
from ntd_gtfs_to_socrata_spark.queries.privacy_q import _L, privacy_l_diversity


def test_phash_banding_loses_no_pair_vs_bruteforce(spark, sf_dir):
    banded = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in mm_phash_neardup(spark, sf_dir).collect()
    }
    assert banded, "fixture corpus contains phash near-dups"
    # brute force: all-pairs hamming over the same band signatures
    bands = MM.phash_bands(
        MM.attach_payload(load_table(spark, sf_dir, "documents"))
    ).collect()
    brute = {}
    for i, a in enumerate(bands):
        for b in bands[i + 1 :]:
            h = sum(
                bin(a[f"b{j}"] ^ b[f"b{j}"]).count("1") for j in range(4)
            )
            if h <= _PHASH_T:
                key = (min(a["doc_id"], b["doc_id"]), max(a["doc_id"], b["doc_id"]))
                brute[key] = h
    assert banded == brute  # exact: pigeonhole guarantees zero recall loss


def test_phash_bands_are_16bit(spark, sf_dir):
    rows = MM.phash_bands(
        MM.attach_payload(load_table(spark, sf_dir, "documents"))
    ).collect()
    for r in rows:
        for j in range(4):
            assert 0 <= r[f"b{j}"] < (1 << 16)


def test_l_diversity_bounded_by_k_anonymity_universe(spark, sf_dir):
    row = privacy_l_diversity(spark, sf_dir).collect()[0]
    assert row["min_diversity"] >= 1
    assert 0 <= row["n_low_diversity"] <= row["n_groups"]
    assert row["min_entropy"] >= 0.0
    # a group below l distinct values has entropy < ln(l)
    import math

    if row["n_low_diversity"] > 0:
        assert row["min_entropy"] < math.log(_L) + 1e-9
    cust = load_table(spark, sf_dir, "customer")
    n_groups_direct = (
        cust.select(
            "c_nationkey", F.floor(F.col("c_acctbal") / 1000).alias("bal_band")
        )
        .distinct()
        .count()
    )
    assert row["n_groups"] == n_groups_direct


def test_parse_header_real_byte_layouts():
    """The header parser reads REAL container layouts: a hand-built PNG
    IHDR, a JPEG whose SOF0 sits behind extra APPn/comment segments
    (marker walk must skip by length), truncated/malformed variants, and
    a foreign format."""
    import struct

    from ntd_gtfs_to_socrata_spark.operators.multimodal import (
        JPEG_SOI,
        PNG_SIG,
        parse_header,
    )

    ihdr = struct.pack(">II", 1234, 567) + bytes([16, 4, 0, 0, 0])
    png = PNG_SIG + b"\x00\x00\x00\x0dIHDR" + ihdr + b"\x00\x00\x00\x00"
    assert parse_header(png) == ("png", 1234, 567, 16, 2, True)

    # JPEG: SOI + APP1 (Exif-style, must be skipped) + COM + SOF2
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    com = b"\xff\xfe" + struct.pack(">H", 5) + b"abc"
    sof2 = (
        b"\xff\xc2"
        + struct.pack(">H", 11)
        + bytes([12])
        + struct.pack(">HH", 600, 800)
        + bytes([1, 0x11, 0])
    )
    assert parse_header(JPEG_SOI + app1 + com + sof2) == (
        "jpeg", 800, 600, 12, 1, True,
    )

    # truncated PNG (signature only), bad IHDR tag, truncated JPEG
    assert parse_header(PNG_SIG) == ("png", None, None, None, None, False)
    bad = PNG_SIG + b"\x00\x00\x00\x0dIDAT" + ihdr + b"\x00\x00\x00\x00"
    assert parse_header(bad) == ("png", None, None, None, None, False)
    assert parse_header(JPEG_SOI + app1) == ("jpeg", None, None, None, None, False)
    assert parse_header(b"GIF89a....") == (
        "unknown", None, None, None, None, False,
    )
    assert parse_header(b"") == ("unknown", None, None, None, None, False)
    # invalid PNG color type -> channels unknown, ok False
    bad_ct = (
        PNG_SIG
        + b"\x00\x00\x00\x0dIHDR"
        + struct.pack(">II", 1, 1)
        + bytes([8, 9, 0, 0, 0])
        + b"\x00\x00\x00\x00"
    )
    assert parse_header(bad_ct) == ("png", 1, 1, 8, None, False)


def test_make_image_payload_roundtrip(spark, sf_dir):
    """JVM-built container bytes parse back to the construction formula
    for every doc — the end-to-end build→parse loop at fixture scale."""
    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.operators.multimodal import (
        make_image_payload,
        parse_image_headers,
    )

    docs = load_table(spark, sf_dir, "documents").limit(50)
    parsed = parse_image_headers(make_image_payload(docs))
    rows = {r["doc_id"]: r for r in parsed.collect()}
    for r in docs.select("doc_id", F.octet_length("text").alias("nb")).collect():
        p = rows[r["doc_id"]]
        assert p["ok"], p
        assert p["width"] == r["nb"] % 640 + 1
        assert p["height"] == r["nb"] % 480 + 1
        assert p["format"] == ("png" if r["doc_id"] % 2 == 0 else "jpeg")


def test_parse_header_jpeg_fill_bytes_and_sos_stop():
    """Real-world JPEG quirks (advisor r8): runs of 0xFF fill bytes before
    a marker are legal padding and must be skipped, and the walk must stop
    at SOS (0xDA) — entropy-coded data follows, so a stream with no SOF
    before SOS returns ok=False instead of misparsing pixel bytes."""
    import struct

    from ntd_gtfs_to_socrata_spark.operators.multimodal import (
        JPEG_SOI,
        parse_header,
    )

    # fill bytes 0xFF 0xFF before SOF0: must still parse the frame header
    sof0 = (
        b"\xff\xff\xff\xc0"
        + struct.pack(">H", 11)
        + bytes([8])
        + struct.pack(">HH", 10, 20)
        + bytes([1, 0x11, 0])
    )
    assert parse_header(JPEG_SOI + sof0) == ("jpeg", 20, 10, 8, 1, True)

    # SOS with no prior SOF: stop the walk, errors-as-data
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x3f\x00\x00"
    assert parse_header(JPEG_SOI + sos + b"\x12\x34\xff\xc0") == (
        "jpeg", None, None, None, None, False,
    )


def test_bmp_parse_real_byte_layouts():
    """_parse_bmp reads real BMP layouts: hand-built bottom-up and
    TOP-DOWN (negative height) files, plus malformed variants (short,
    wrong magic, 8-bpp, compressed, truncated pixel array)."""
    import struct

    import numpy as np

    from ntd_gtfs_to_socrata_spark.operators.multimodal import _parse_bmp

    def build(w, h, pixels, top_down=False):
        stride = ((w * 3 + 3) // 4) * 4
        hh = -h if top_down else h
        hdr = b"BM" + struct.pack("<IHHI", 54 + stride * h, 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, w, hh, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
        body = bytearray()
        for r in range(h):
            row = bytearray()
            for px in pixels[r]:
                row += bytes(px)  # already BGR triples
            row += b"\x00" * (stride - w * 3)
            body += row
        return hdr + info + bytes(body)

    # 2x2: file rows bottom-up, so image row 0 = file row 1
    file_rows = [
        [(1, 2, 3), (4, 5, 6)],      # file row 0 = image BOTTOM
        [(7, 8, 9), (10, 11, 12)],   # file row 1 = image TOP
    ]
    w, h, img = _parse_bmp(build(2, 2, file_rows))
    assert (w, h) == (2, 2)
    assert img[0].tolist() == [[7, 8, 9], [10, 11, 12]]  # top row
    assert img[1].tolist() == [[1, 2, 3], [4, 5, 6]]

    # top-down: image order equals file order
    w, h, img = _parse_bmp(build(2, 2, file_rows, top_down=True))
    assert img[0].tolist() == [[1, 2, 3], [4, 5, 6]]

    good = build(2, 2, file_rows)
    assert _parse_bmp(b"") is None
    assert _parse_bmp(b"XX" + good[2:]) is None
    assert _parse_bmp(good[:40]) is None            # short header
    assert _parse_bmp(good[:-3]) is None            # truncated pixels
    bad_bpp = bytearray(good); bad_bpp[28] = 8
    assert _parse_bmp(bytes(bad_bpp)) is None
    bad_comp = bytearray(good); bad_comp[30] = 1    # BI_RLE8
    assert _parse_bmp(bytes(bad_comp)) is None


def test_bmp_payload_is_valid_bmp_and_formula_exact(spark, sf_dir):
    """End-to-end: JVM-built BMPs parse as real files and every decoded
    channel sum equals the construction formula, doc by doc."""
    from pyspark.sql import functions as F

    from ntd_gtfs_to_socrata_spark.io import load_table
    from ntd_gtfs_to_socrata_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").limit(20)
    nb = {
        r["doc_id"]: r["nb"]
        for r in docs.select("doc_id", F.octet_length("text").alias("nb")).collect()
    }
    dec = MM.decode_bmp(MM.make_bmp_payload(docs)).collect()
    assert len(dec) == len(nb)
    for r in dec:
        n = nb[r["doc_id"]]
        w, h = n % 8 + 1, n % 6 + 1
        sums = {0: 0, 1: 0, 2: 0}
        for rr in range(h):
            for j in range(w * 3):
                sums[j % 3] += (r["doc_id"] + 13 * rr + 7 * j) % 256
        assert (r["width"], r["height"], r["ok"]) == (w, h, True)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == (sums[2], sums[1], sums[0])


def test_bmp_resize_matches_independent_nn_reference(spark, sf_dir):
    """mm_bmp_resize vs a from-scratch reference: decode each payload
    with _parse_bmp directly (driver-side), resample with explicit
    per-pixel floor math (no np.ix_ fancy-indexing, no shared helper),
    and require byte equality on every output pixel."""
    from ntd_gtfs_to_socrata_spark.operators import multimodal as MM
    from ntd_gtfs_to_socrata_spark.queries.multimodal_q import mm_bmp_resize

    docs = load_table(spark, sf_dir, "documents").limit(40)
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in MM.make_bmp_payload(docs).collect()
    }
    expected = set()
    for doc_id, blob in payloads.items():
        w, h, img = MM._parse_bmp(blob)
        for y in range(MM.RESIZE_H):
            for x in range(MM.RESIZE_W):
                sy = (y * h) // MM.RESIZE_H
                sx = (x * w) // MM.RESIZE_W
                bb, gg, rr = (int(v) for v in img[sy, sx])
                expected.add((doc_id, x, y, rr, gg, bb))

    got = {
        tuple(r)
        for r in mm_bmp_resize(spark, sf_dir)
        .filter(F.col("doc_id").isin(*payloads))
        .collect()
    }
    assert got == expected


def test_bmp_resize_fanout_is_bounded(spark, sf_dir):
    """Exactly RESIZE_W*RESIZE_H rows per decodable image, coordinates in
    range — the bounded fan-out contract the scale posture relies on."""
    from ntd_gtfs_to_socrata_spark.operators import multimodal as MM
    from ntd_gtfs_to_socrata_spark.queries.multimodal_q import mm_bmp_resize

    out = mm_bmp_resize(spark, sf_dir)
    per_doc = out.groupBy("doc_id").count()
    n_cells = MM.RESIZE_W * MM.RESIZE_H
    assert per_doc.filter(F.col("count") != n_cells).count() == 0
    bounds = out.agg(
        F.max("x").alias("mx"),
        F.max("y").alias("my"),
        F.min("r").alias("mr"),
        F.max("r").alias("xr"),
    ).first()
    assert bounds["mx"] == MM.RESIZE_W - 1 and bounds["my"] == MM.RESIZE_H - 1
    assert 0 <= bounds["mr"] and bounds["xr"] <= 255
