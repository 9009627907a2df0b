"""Semantic truth for tp_decontaminate_fuzzy on a forced-contamination
fixture: a lightly paraphrased benchmark leak must be flagged, an unrelated
train doc must not, and the eval set itself never appears in the drop list.
doc_id 0 has md5-bucket 97 (eval side of the 90 split); ids 1-6 are train."""

from __future__ import annotations

import unittest.mock as mock

from ntd_gtfs_to_socrata_spark.queries.training_prep import (
    _DECON_EVAL_BUCKET,
    tp_decontaminate_fuzzy,
)

BENCH = (
    "question one what is the capital of france answer paris "
    "question two what is two plus two answer four "
    "question three who wrote hamlet answer shakespeare"
)
# paraphrased leak: same body, one token changed + a prefix (high Jaccard)
LEAK = (
    "exam question one what is the capital of france answer paris "
    "question two what is two plus two answer four "
    "question three who wrote hamlet answer shakespeare"
)
CLEAN = (
    "completely different prose about distributed query engines and "
    "shuffle partitioning strategies for large scale analytics work"
)


def _patched(docs):
    return (
        mock.patch(
            "ntd_gtfs_to_socrata_spark.queries.training_prep.load_table",
            return_value=docs,
        ),
        mock.patch(
            "ntd_gtfs_to_socrata_spark.queries.dedup_text.load_table",
            return_value=docs,
        ),
    )


def test_fuzzy_decontamination_flags_paraphrased_leak(spark):
    rows = [(0, BENCH), (1, LEAK), (2, CLEAN), (3, CLEAN + " extra tail")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    p1, p2 = _patched(docs)
    with p1, p2:
        out = tp_decontaminate_fuzzy(spark, "unused").collect()
    flagged = {r["doc_id"]: r for r in out}
    assert 1 in flagged, "paraphrased leak not flagged"
    assert flagged[1]["matched_eval"] == 0
    assert flagged[1]["jaccard_micro"] >= 500_000
    assert 2 not in flagged and 3 not in flagged, "clean doc falsely flagged"
    assert 0 not in flagged, "eval doc flagged as train contamination"


def test_fuzzy_decontamination_argmax_tiebreak(spark):
    """Two eval docs matching one train doc: the row must carry the max
    Jaccard, ties broken toward the lower eval id (0 and 8 are both eval
    buckets >= the split constant)."""
    assert _DECON_EVAL_BUCKET == 90
    rows = [(0, BENCH), (8, BENCH), (1, LEAK)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    p1, p2 = _patched(docs)
    with p1, p2:
        out = tp_decontaminate_fuzzy(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert r["doc_id"] == 1 and r["matched_eval"] == 0  # tie -> min eval id


def test_compression_ratio_parity_and_ordering(spark, sf_dir):
    """Values must equal direct zlib at the fixed level; a highly
    repetitive doc must compress far better than prose."""
    import zlib

    import pandas as pd

    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        _ZR_LEVEL,
        text_compression_ratio,
    )

    rows = {
        r["doc_id"]: r for r in text_compression_ratio(spark, sf_dir).collect()
    }
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    assert len(rows) == len(docs)
    for _, d in docs.head(50).iterrows():
        b = d["text"].encode("utf-8")
        c = len(zlib.compress(b, _ZR_LEVEL))
        r = rows[d["doc_id"]]
        assert (r["raw_bytes"], r["compressed_bytes"]) == (len(b), c)
        assert r["ratio_micro"] == (c * 1_000_000 + len(b) // 2) // len(b)

    import unittest.mock as mock

    junk = "spam ham " * 400
    prose = (
        "the quarterly committee reviewed seventeen distinct proposals "
        "covering irrigation, logistics, procurement and archival policy "
        "before adjourning without a final recommendation on budget lines"
    ) * 10
    fixture = spark.createDataFrame(
        [(1, junk), (2, prose)], ["doc_id", "text"]
    )
    from ntd_gtfs_to_socrata_spark.queries import dedup_text as DT

    with mock.patch.object(DT, "load_table", return_value=fixture):
        out = {
            r["doc_id"]: r["ratio_micro"]
            for r in text_compression_ratio(spark, "x").collect()
        }
    assert out[1] < out[2], "repetitive junk must compress better than prose"


def test_zipf_fit_python_recompute_and_range(spark, sf_dir):
    """Recompute the quantized regression from pandas token counts and
    compare exactly; the fixture corpus must fit a negative slope."""
    import math
    from collections import Counter

    import pandas as pd

    from ntd_gtfs_to_socrata_spark.queries.dedup_text import (
        _ZIPF_TOP,
        dq_zipf_fit,
    )

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    cnt = Counter()
    for t in docs["text"]:
        cnt.update(t.strip().split())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_ZIPF_TOP]
    pts = [
        (
            int(math.floor(math.log(r) * 1e6 + 0.5)),
            int(math.floor(math.log(c) * 1e6 + 0.5)),
        )
        for r, (_, c) in enumerate(top, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    want = int(
        math.floor(
            float(n * sxy - sx * sy) / float(n * sxx - sx * sx) * 1e6 + 0.5
        )
    )
    r = dq_zipf_fit(spark, sf_dir).collect()[0]
    assert r["n_points"] == n
    assert r["zipf_slope_micro"] == want
    assert r["zipf_slope_micro"] < 0
