"""Duplicated-span extraction: maximal shared passages between
candidate doc pairs, validated against a brute-force reference and a
hypothesis property over planted copies."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.spandup import (
    duplicate_spans,
    kgram_table,
    span_dedup_stats,
)


def _brute_spans(a: str, b: str, k: int, min_len: int):
    """Reference: maximal runs of matching k-grams per diagonal."""
    grams_b: dict[str, list[int]] = {}
    for j in range(len(b) - k + 1):
        grams_b.setdefault(b[j:j + k], []).append(j)
    matches = set()
    for i in range(len(a) - k + 1):
        for j in grams_b.get(a[i:i + k], ()):
            matches.add((i, j))
    spans = []
    for (i, j) in sorted(matches):
        if (i - 1, j - 1) in matches:
            continue  # not a run start
        run = 0
        while (i + run + 1, j + run + 1) in matches:
            run += 1
        length = run + k
        if length >= min_len:
            spans.append((i, j, length))
    return sorted(spans)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_kgram_table_positions(spark):
    rows = kgram_table(_docs(spark, ["abcde", "xy"]), 3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["gram"]))
    assert sorted(by_doc[0]) == [(0, "abc"), (1, "bcd"), (2, "cde")]
    assert 1 not in by_doc  # shorter than k


def test_single_planted_span(spark):
    shared = "the quick brown fox jumps over the lazy dog"
    a = "AAA " + shared + " BBB"
    b = "CCC DDD " + shared + " EEE"
    spans = duplicate_spans(
        _docs(spark, [a, b]), _pairs(spark, [(0, 1)]),
        k=8, min_len=16).collect()
    assert len(spans) == 1
    s = spans[0]
    assert a[s["a_start"]:s["a_start"] + s["length"]] == \
        b[s["b_start"]:s["b_start"] + s["length"]]
    assert shared in a[s["a_start"]:s["a_start"] + s["length"]]


def test_matches_brute_force_on_overlapping_text(spark):
    a = "abcabcabc XX abcabc YY zzzzzz"
    b = "abcabcabc QQ zzzzzz PP abcabc"
    k, min_len = 4, 6
    got = sorted(
        (r["a_start"], r["b_start"], r["length"])
        for r in duplicate_spans(
            _docs(spark, [a, b]), _pairs(spark, [(0, 1)]),
            k=k, min_len=min_len).collect())
    assert got == _brute_spans(a, b, k, min_len)


def test_only_candidate_pairs_are_searched(spark):
    t = "identical text body shared by every doc here"
    docs = _docs(spark, [t, t, t])
    spans = duplicate_spans(
        docs, _pairs(spark, [(0, 1)]), k=8, min_len=16).collect()
    assert {(s["doc_a"], s["doc_b"]) for s in spans} == {(0, 1)}


def test_stats_rollup(spark):
    shared = "one common passage that repeats verbatim here ok"
    docs = _docs(spark, [
        "X " + shared, "Y " + shared + " tail", shared + " Z"])
    pairs = _pairs(spark, [(0, 1), (0, 2)])
    spans = duplicate_spans(docs, pairs, k=8, min_len=16)
    stats = {r["doc_b"]: r for r in span_dedup_stats(spans).collect()}
    assert set(stats) == {1, 2}
    assert stats[1]["n_sources"] == 1
    assert stats[1]["longest"] >= len(shared)


def test_plan_has_no_python_and_no_cartesian(spark):
    df = duplicate_spans(
        _docs(spark, ["abcdef", "abcxyz"]),
        _pairs(spark, [(0, 1)]), k=3, min_len=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan
    assert "CartesianProduct" not in plan


@settings(max_examples=10, deadline=None)
@given(
    st.text(alphabet="abcd", min_size=20, max_size=60),
    st.text(alphabet="abcd", min_size=20, max_size=60),
    st.text(alphabet="wxyz", min_size=12, max_size=30),
)
def test_property_matches_brute_force(spark, left, right, planted):
    a = left + planted + left[:5]
    b = right[:7] + planted + right
    k, min_len = 5, 8
    got = sorted(
        (r["a_start"], r["b_start"], r["length"])
        for r in duplicate_spans(
            _docs(spark, [a, b]), _pairs(spark, [(0, 1)]),
            k=k, min_len=min_len).collect())
    assert got == _brute_spans(a, b, k, min_len)
    # the planted passage is always recovered
    assert any(
        a[s:s + ln] == planted[: ln] or planted in a[s:s + ln]
        for s, _, ln in got
    ) or len(planted) < min_len