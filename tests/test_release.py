"""Corpus release gate (functions/release.py): verdicts and reason
codes on a planted corpus, and the zero-Python plan pin."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.functions.release import (
    corpus_release_gate,
)

# A paragraph that passes every Gopher rule (>=50 words, normal word
# lengths, no symbol soup, the required stop words present).
_GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back "
    "to the barn with a friend of the family that was waiting there "
    "for a long time because the weather had been good and the road "
    "was dry so they could travel together in comfort and arrive "
    "home before dark with plenty of time to spare for dinner"
)


def _df(spark):
    rows = [
        # three copies: every bigram has corpus count >= 3 → rare_ok
        (0, _GOOD),
        (1, _GOOD),
        (2, _GOOD),
        # PII planted into otherwise-shippable text
        (3, _GOOD + " contact me at alice@example.com for details"),
        # fails Gopher (too short) AND rare (unique bigrams)
        (4, "zq wv xk"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_release_gate_verdicts(spark):
    got = {r["doc_id"]: r for r in corpus_release_gate(_df(spark)).collect()}
    for d in (0, 1, 2):
        assert got[d]["keep"] is True and got[d]["reasons"] == ""
        assert got[d]["gopher_pass"] and not got[d]["has_pii"]
        assert got[d]["rare_ok"]
    assert got[3]["keep"] is False
    assert got[3]["has_pii"] is True
    # the email adds a handful of rare bigrams but stays under 1/5
    assert got[3]["reasons"] == "pii"
    assert got[4]["keep"] is False
    assert got[4]["gopher_pass"] is False and got[4]["rare_ok"] is False
    assert got[4]["reasons"] == "quality,rare_ngrams"


def test_release_gate_zero_python(spark):
    plan = (
        corpus_release_gate(_df(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_null_text_is_a_quality_drop(spark):
    df = spark.createDataFrame(
        [(9, None)], "doc_id long, text string")
    row = corpus_release_gate(df).collect()[0]
    assert row["keep"] is False
    assert row["has_pii"] is False
    assert "quality" in row["reasons"]
