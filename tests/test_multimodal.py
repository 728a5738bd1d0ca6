"""Unit tests for operators/multimodal.py — the Arrow-batched plumbing
(schema, batch shapes, row expansion) with the stubbed decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "abc", 3), (2, "", 0), (3, "hello world", 11)],
        ["doc_id", "text", "n_chars"],
    )
    return MM.documents_as_media(docs).cache()


def test_media_schema(media):
    # names/types must match the canonical schema (nullability may
    # differ when derived from a nullable source column; simpleString
    # renders names+types only, recursively)
    assert media.schema.simpleString() == MM.MEDIA_SCHEMA.simpleString()


def test_extract_byte_stats(media):
    rows = {r["media_id"]: r for r in MM.extract_byte_stats(media).collect()}
    assert rows[1]["n_bytes"] == 3
    assert rows[1]["byte_sum"] == ord("a") + ord("b") + ord("c")
    assert rows[1]["byte_min"] == ord("a") and rows[1]["byte_max"] == ord("c")
    assert rows[2]["n_bytes"] == 0 and rows[2]["byte_sum"] == 0
    assert rows[3]["byte_min"] == ord(" ")
    assert rows[1]["kind"] == "image"


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"\x89PNG", "png")


def test_resize_stub_rewrites_meta(media):
    out = MM.resize_stub(media, 32, 16)
    assert out.schema.simpleString() == MM.MEDIA_SCHEMA.simpleString()
    r = out.filter(F.col("media_id") == 1).first()
    assert r["meta"]["width"] == 32 and r["meta"]["height"] == 16
    assert bytes(r["payload"]) == b"abc"


def test_frame_sample_stub(spark):
    docs = spark.createDataFrame([(1, "x", 1)], ["doc_id", "text", "n_chars"])
    media = MM.documents_as_media(docs).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("raw").alias("format"),
            F.lit(1).alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(7).alias("n_frames"),
        ),
    )
    out = MM.frame_sample_stub(media, every_n=2).collect()
    assert [(r["media_id"], r["frame_idx"]) for r in out] == [
        (1, 0), (1, 2), (1, 4), (1, 6)
    ]


def test_resize_stub_shapes_and_meta(spark):
    """NN-resize plumbing: every output payload is exactly target_w*h
    bytes, meta reflects the new dims, and corner pixels sample the
    expected source bytes."""
    from bigdata_invoice_stream_analysis_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "abcdefgh", 8), (2, "xy", 2), (3, None, 0)],
        "doc_id long, text string, n_chars long",
    )
    media = MM.documents_as_media(docs).withColumn(
        "meta",
        F.col("meta")
        .withField("width", F.least(F.col("meta.width"), F.lit(4)))
        .withField("height", F.lit(2)),
    )
    out = {
        r.media_id: r
        for r in MM.resize_stub(media, 2, 2, resample=True).collect()
    }
    assert all(
        r.meta.width == 2 and r.meta.height == 2 for r in out.values()
    )
    # doc 1: 4x2 raster 'abcd'/'efgh' -> corners a, c, e, g
    assert out[1].payload == b"aceg"
    assert len(out[2].payload) == 4  # padded raster still resizes
    assert out[3].payload is None  # null payload stays null


def test_audio_chunk_stub_spans(spark):
    """Chunk spans tile the payload exactly: contiguous, non-overlapping,
    summing to the byte length; short tail chunk kept."""
    import pyspark.sql.functions as F

    from bigdata_invoice_stream_analysis_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_chunk_stub,
    )

    rows = [
        (1, b"x" * 950, ("audio", "raw", None, None, 100, None)),  # 200-byte chunks
        (2, b"y" * 100, ("audio", "raw", None, None, 400, None)),  # single short chunk
        (3, b"", ("audio", "raw", None, None, 100, None)),          # empty payload
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in audio_chunk_stub(media, chunk_seconds=2)
        .groupBy("media_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("n_bytes").alias("total"),
            F.min("n_bytes").alias("tail"),
        )
        .collect()
    }
    assert got[1]["n"] == 5 and got[1]["total"] == 950 and got[1]["tail"] == 150
    assert got[2]["n"] == 1 and got[2]["total"] == 100
    assert 3 not in got  # empty payload -> no chunks
