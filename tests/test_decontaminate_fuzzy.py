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
