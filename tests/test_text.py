"""Unit tests for functions/text.py (tokenize/shingles/hash/lang/quality)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions import text as TX


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_tokenize(spark):
    v = one(spark, TX.tokenize(F.lit("Hello,  world! 42 foo-bar")))
    assert v == ["hello", "world", "42", "foo", "bar"]


def test_tokenize_empty(spark):
    assert one(spark, TX.tokenize(F.lit(""))) == []
    assert one(spark, TX.tokenize(F.lit("   "))) == []


def test_poly_hash_matches_python(spark):
    def py_poly(s: str) -> int:
        h = 0
        for c in s:
            h = (h * TX.HASH_MULT + ord(c)) % TX.HASH_P
        return h

    for s in ["", "a", "hello world", "the quick brown fox"]:
        assert one(spark, TX.poly_hash(F.lit(s))) == py_poly(s)


def test_shingles_basic(spark):
    toks = F.split(F.lit("a b c d"), " ")
    assert one(spark, TX.shingles(toks, 3)) == ["a b c", "b c d"]


def test_shingles_short_doc(spark):
    toks = F.split(F.lit("a b"), " ")
    assert one(spark, TX.shingles(toks, 3)) == ["a b"]


def test_shingle_hashes_distinct(spark):
    v = one(spark, TX.shingle_hashes(F.lit("a b a b a b a b"), 3))
    # only two distinct shingles: "a b a" and "b a b"
    assert len(v) == 2


def test_detect_language(spark):
    rows = (
        spark.createDataFrame(
            [("the cat is on the mat and the dog",), ("zzz qqq xxx",)], ["t"]
        )
        .select(TX.detect_language(F.col("t")).alias("lang"))
        .collect()
    )
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "und"


def test_quality_features(spark):
    feats = TX.quality_features(F.lit("The cat sat on 42 mats."))
    row = spark.range(1).select(
        *[c.alias(k) for k, c in feats.items()]
    ).first()
    assert row["n_tokens"] == 6
    assert row["n_chars"] == 23
    # tokens: the cat sat on 42 mats → stopwords: the, on → 2/6
    assert row["stopword_ratio"] == pytest.approx(2 / 6)
    assert row["digit_ratio"] == pytest.approx(2 / 23)
    assert row["mean_token_len"] == pytest.approx((3 + 3 + 3 + 2 + 2 + 4) / 6)


def test_fingerprint_normalizes_whitespace(spark):
    a = one(spark, TX.fingerprint(F.lit("hello   world")))
    b = one(spark, TX.fingerprint(F.lit("Hello, world!")))
    assert a == b
