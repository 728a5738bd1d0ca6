"""SRT/WebVTT cue parsing: timing arithmetic, header/NOTE/STYLE
skipping, markup cleaning, format sniffing, error surfacing, and the
Spark cue-explosion operator."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.subtitles import (
    clean_cue_text,
    parse_srt,
    parse_subtitles,
    parse_vtt,
    subtitle_cues,
)

SRT = """\
1
00:00:01,000 --> 00:00:02,500
Hello <i>world</i>

2
00:01:00,000 --> 00:01:03,250
Two lines
of &amp; text
"""

VTT = """\
WEBVTT - test file
Kind: captions

NOTE this block is skipped

STYLE
::cue { color: red }

intro-cue
00:01.000 --> 00:02.500 align:start line:0
Hello <c.yellow>world</c>

01:00:00.000 --> 01:00:03.250
Second <00:00:01.000>cue
"""


def test_parse_srt():
    cues = parse_srt(SRT)
    assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
        (1000, 2500), (60000, 63250),
    ]
    assert cues[0]["text"] == "Hello world"
    assert cues[1]["text"] == "Two lines\nof & text"
    assert cues[0]["settings"] is None


def test_parse_vtt():
    cues = parse_vtt(VTT)
    assert [(c["start_ms"], c["end_ms"]) for c in cues] == [
        (1000, 2500), (3600000, 3600000 + 3250),
    ]
    assert cues[0]["settings"] == "align:start line:0"
    assert cues[0]["text"] == "Hello world"
    assert cues[1]["text"] == "Second cue"  # karaoke timestamp stripped


def test_sniff_and_crlf_and_bom():
    fmt, cues = parse_subtitles("﻿WEBVTT\r\n\r\n00:01.000 --> 00:02.000\r\nx")
    assert fmt == "vtt" and len(cues) == 1
    fmt, cues = parse_subtitles("00:00:01,000 --> 00:00:02,000\nx")
    assert fmt == "srt" and cues[0]["text"] == "x"


def test_errors_are_loud():
    with pytest.raises(ValueError, match="WEBVTT magic"):
        parse_vtt("not a vtt")
    with pytest.raises(ValueError, match="bad SRT timing"):
        parse_srt("1\n00:00:01 --> 00:00:02\nx")
    with pytest.raises(ValueError, match="timing line"):
        parse_vtt("WEBVTT\n\njust-an-id\nno arrow here")


def test_clean_cue_text():
    assert clean_cue_text("<b>a</b>  b\n<v Speaker>c&gt;d") == "a b\nc>d"
    assert clean_cue_text("<00:00:01.000>word") == "word"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3_600_000),
            st.integers(min_value=1, max_value=60_000),
            st.text(
                alphabet="abc &<>", min_size=1, max_size=12,
            ).map(str.strip).filter(bool).filter(
                lambda s: "<" not in s  # raw '<' starts markup
            ),
        ),
        min_size=1, max_size=8,
    )
)
@settings(max_examples=100, deadline=None)
def test_srt_roundtrip_property(cues):
    def fmt_ts(ms):
        h, rem = divmod(ms, 3_600_000)
        m, rem = divmod(rem, 60_000)
        s, ms_ = divmod(rem, 1000)
        return f"{h:02d}:{m:02d}:{s:02d},{ms_:03d}"

    doc = "\n\n".join(
        f"{i + 1}\n{fmt_ts(start)} --> {fmt_ts(start + dur)}\n{text}"
        for i, (start, dur, text) in enumerate(cues)
    )
    parsed = parse_srt(doc)
    assert [(c["start_ms"], c["end_ms"]) for c in parsed] == [
        (s, s + d) for s, d, _ in cues
    ]
    from bigdata_invoice_stream_analysis_spark.operators.warc import (
        decode_entities,
    )

    for c, (_, _, text) in zip(parsed, cues):
        assert c["text"] == decode_entities(
            " ".join(text.split())
        ).strip() or c["raw"] == text


def test_subtitle_cues_operator(spark):
    df = spark.createDataFrame(
        [(1, bytearray(SRT.encode())), (2, bytearray(VTT.encode()))],
        "media_id long, payload binary",
    )
    rows = sorted(
        subtitle_cues(df).collect(),
        key=lambda r: (r["media_id"], r["cue_idx"]),
    )
    assert [(r["media_id"], r["format"], r["cue_idx"]) for r in rows] == [
        (1, "srt", 0), (1, "srt", 1), (2, "vtt", 0), (2, "vtt", 1),
    ]
    assert rows[0]["duration_ms"] == 1500
    assert rows[2]["settings"] == "align:start line:0"
    assert rows[3]["n_chars"] == len("Second cue")


def test_cr_only_line_terminators():
    """WebVTT §4 allows bare CR as a line terminator; SRT files from
    old Mac tooling use it too."""
    fmt, cues = parse_subtitles(
        "WEBVTT\r\r00:00:01.000 --> 00:00:02.000\rhello\r"
    )
    assert fmt == "vtt"
    assert [(c["start_ms"], c["text"]) for c in cues] == [(1000, "hello")]
    cues = parse_srt("1\r00:00:01,000 --> 00:00:02,000\rhi\r\r")
    assert cues[0]["text"] == "hi"
