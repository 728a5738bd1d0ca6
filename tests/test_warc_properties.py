"""Property-based pins for the WARC/HTTP/URL machinery: framing
roundtrips over arbitrary record contents (including blocks that
contain WARC version-line bytes), chunked-coding roundtrips over
arbitrary bodies and chunk sizes, and RFC 3986 normalization
idempotence. The review discipline keeps finding bit/byte-level
corners in fresh parser code — these pin the lattice so the next
corner fails a generated example instead of shipping (the
test_sps_properties.py precedent)."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.warc import (
    decode_chunked,
    encode_http_response,
    encode_warc,
    normalize_url,
    parse_http_response,
    parse_warc,
    remove_dot_segments,
)

_REC_TYPES = st.sampled_from(
    ["warcinfo", "request", "response", "metadata", "resource",
     "conversion", "revisit"]
)
# Header values: no CR/LF (the writer does not escape continuations).
_HDR_VALUE = st.text(
    alphabet=st.characters(blacklist_characters="\r\n",
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=30,
).map(str.strip)
# Blocks are arbitrary bytes — deliberately include the version-line
# marker so framing-by-scanning would be caught.
_BLOCK = st.one_of(
    st.binary(min_size=0, max_size=200),
    st.binary(min_size=0, max_size=60).map(lambda b: b"WARC/1.0\r\n" + b),
)
_RECORD = st.tuples(
    _REC_TYPES,
    st.dictionaries(
        st.sampled_from(
            ["WARC-Target-URI", "WARC-Date", "Content-Type",
             "WARC-Record-ID"]
        ),
        _HDR_VALUE, max_size=4,
    ),
    _BLOCK,
)


@given(st.lists(_RECORD, min_size=0, max_size=6), st.booleans())
@settings(max_examples=120, deadline=None)
def test_warc_roundtrip_property(records, gz):
    parsed = parse_warc(encode_warc(records, gzip_members=gz))
    assert len(parsed) == len(records)
    for (rtype, headers, block), rec in zip(records, parsed):
        assert rec["headers"]["WARC-Type"] == rtype
        assert rec["block"] == block
        for k, v in headers.items():
            if k.lower() not in ("warc-type", "content-length") and v:
                assert rec["headers"][k] == v


@given(st.binary(min_size=0, max_size=500),
       st.integers(min_value=1, max_value=64))
@settings(max_examples=120, deadline=None)
def test_chunked_roundtrip_property(body, chunk_size):
    msg = encode_http_response(
        200, "OK", {"Content-Type": "x/y"}, body,
        chunked=True, chunk_size=chunk_size,
    )
    resp = parse_http_response(msg)
    assert resp["body"] == body
    # And the raw chunked framing decodes standalone as well.
    head_end = msg.find(b"\r\n\r\n") + 4
    assert decode_chunked(msg[head_end:]) == body


_URL = st.builds(
    lambda scheme, host, port, path, query: (
        f"{scheme}://{host}{port}{path}{query}"
    ),
    st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
    st.from_regex(r"[A-Za-z0-9.%7E-]{1,12}", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.from_regex(r"(/(\.\.?|[a-z%7E]{0,4})){0,5}/?", fullmatch=True),
    st.sampled_from(["", "?a=1", "?x=%2f", "?%7e"]),
)


@given(_URL)
@settings(max_examples=300, deadline=None)
def test_normalize_url_idempotent_property(url):
    once = normalize_url(url)
    if once is None:
        return
    assert normalize_url(once) == once


@given(st.from_regex(r"(/(\.\.?|[ab]{0,3})){0,6}/?", fullmatch=True))
@settings(max_examples=300, deadline=None)
def test_remove_dot_segments_is_idempotent_and_dotless(path):
    out = remove_dot_segments(path)
    assert remove_dot_segments(out) == out
    assert ".." not in out.split("/")
    assert "." not in out.split("/")
    if path.startswith("/"):
        assert out.startswith("/")
