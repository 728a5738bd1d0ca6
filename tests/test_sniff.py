"""Unified content triage: magic-byte sniffing across every format
this repo parses, per-format dispatch correctness, the corrupt-file
category, and the Spark operator over a mixed corpus."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.ebml import (
    encode_minimal_webm,
)
from bigdata_invoice_stream_analysis_spark.operators.exif import (
    encode_exif_jpeg,
)
from bigdata_invoice_stream_analysis_spark.operators.gif import (
    encode_minimal_gif,
)
from bigdata_invoice_stream_analysis_spark.operators.jpeg import encode_jpeg
from bigdata_invoice_stream_analysis_spark.operators.mp4 import (
    encode_minimal_mp4,
)
from bigdata_invoice_stream_analysis_spark.operators.mpegaudio import (
    encode_adts,
    encode_mp3,
)
from bigdata_invoice_stream_analysis_spark.operators.multimodal import (
    encode_pnm,
    encode_png,
    encode_wav,
)
from bigdata_invoice_stream_analysis_spark.operators.sniff import (
    content_triage,
    sniff_format,
    triage,
)
from bigdata_invoice_stream_analysis_spark.operators.warc import encode_warc
from bigdata_invoice_stream_analysis_spark.operators.wds import encode_tar
from bigdata_invoice_stream_analysis_spark.operators.webp import encode_webp
from bigdata_invoice_stream_analysis_spark.operators.zip import encode_zip


def _payloads() -> dict[str, bytes]:
    return {
        "jpeg": encode_jpeg(bytes([50] * 64), 8, 8, quality=80),
        "png": encode_png(4, 4, bytes(range(16)), channels=1),
        "pnm": encode_pnm(4, 4, bytes(range(16)), channels=1),
        "gif": encode_minimal_gif([10, 20], width=12, height=8),
        "webp": encode_webp(33, 22),
        "wav": encode_wav(bytes(range(100)), 8000),
        "mp4": encode_minimal_mp4([5, 5, 5], avc1=(64, 48, 66, 0, 30)),
        "webm": encode_minimal_webm([(0, True, 9), (40, False, 7)],
                                    codec_id="V_VP9"),
        "warc": encode_warc([("warcinfo", {}, b"x: y\r\n")] * 3),
        "warc_gz": encode_warc([("warcinfo", {}, b"x: y\r\n")] * 3,
                               gzip_members=True),
        "zip": encode_zip([("a.txt", b"hello"), ("b/", b"")]),
        "tar": encode_tar([("a.txt", b"hello")]),
        "vtt": b"WEBVTT\n\n00:01.000 --> 00:02.000\nhi\n",
        "mp3": encode_mp3(4, id3_size=32),
        "adts": encode_adts(5, freq_index=3),
        "unknown": b"\x00\x01\x02\x03 nothing recognizable here",
    }


def test_sniff_format_table():
    got = {k: sniff_format(v) for k, v in _payloads().items()}
    assert got == {
        "jpeg": "jpeg", "png": "png", "pnm": "pnm", "gif": "gif",
        "webp": "webp", "wav": "wav", "mp4": "mp4", "webm": "webm",
        "warc": "warc", "warc_gz": "gzip", "zip": "zip", "tar": "tar",
        "vtt": "vtt", "mp3": "mp3", "adts": "adts",
        "unknown": "unknown",
    }


def test_triage_rows():
    p = _payloads()
    t = {k: triage(v) for k, v in p.items()}
    assert (t["jpeg"]["kind"], t["jpeg"]["width"], t["jpeg"]["height"]) \
        == ("image", 8, 8)
    assert t["jpeg"]["has_metadata_risk"] is False
    assert t["gif"]["n_items"] == 2 and t["gif"]["duration_ms"] == 300
    assert t["webp"]["codec"] == "webp-lossy"
    assert t["mp4"]["kind"] == "video" and t["mp4"]["n_items"] == 3
    assert t["mp4"]["codec"].startswith("avc1.")
    assert t["webm"]["codec"] == "V_VP9" and t["webm"]["n_items"] == 2
    assert t["warc"]["n_items"] == 3 and t["warc"]["kind"] == "web"
    # gzip-membered WARC triages identically (format normalized)
    assert t["warc_gz"]["format"] == "warc"
    assert t["warc_gz"]["n_items"] == 3
    assert t["zip"]["n_items"] == 2 and t["zip"]["kind"] == "archive"
    assert t["tar"]["n_items"] == 1
    assert t["vtt"]["n_items"] == 1 and t["vtt"]["duration_ms"] == 2000
    assert t["mp3"]["codec"] == "mp4a.6b" and t["mp3"]["n_items"] == 4
    assert t["adts"]["codec"] == "mp4a.40.2"
    assert t["wav"]["kind"] == "audio" and t["wav"]["n_items"] == 100
    assert t["unknown"]["format"] == "unknown"


def test_gps_risk_bit():
    risky = encode_exif_jpeg(
        gps=True, body=encode_jpeg(bytes([9] * 64), 8, 8)[2:],
    )
    assert triage(risky)["has_metadata_risk"] is True


def test_corrupt_is_a_category_not_an_exception():
    gif = bytearray(encode_minimal_gif([10]))
    gif[-2] = 0x99
    row = triage(bytes(gif))
    assert row["format"] == "gif!error"
    assert row["detail"]


def test_content_triage_operator(spark):
    p = _payloads()
    df = spark.createDataFrame(
        [(i, bytearray(v)) for i, v in enumerate(p.values())],
        "media_id long, payload binary",
    )
    rows = content_triage(df).collect()
    assert len(rows) == len(p)
    by_fmt = {}
    for r in rows:
        by_fmt.setdefault(r["format"], 0)
        by_fmt[r["format"]] += 1
    assert by_fmt["warc"] == 2  # plain + gzip-membered
    assert by_fmt["unknown"] == 1
    assert sum(by_fmt.values()) == len(p)
