"""operators/memo.py — the bounded digest-keyed memo behind the
r9 distinct-payload decode memos (r10 ADVICE fix: digest keys so no
payload bytes are retained, LRU cap so high-cardinality corpora
cannot grow a task's memo unbounded)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.memo import (
    BoundedMemo,
    payload_key,
    text_key,
)


def test_get_put_roundtrip():
    m = BoundedMemo(cap=4)
    k = payload_key(b"payload-bytes")
    assert m.get(k) is None
    m.put(k, ("w", "h"))
    assert m.get(k) == ("w", "h")
    assert len(m) == 1


def test_cap_evicts_least_recently_used():
    m = BoundedMemo(cap=2)
    m.put("a", 1)
    m.put("b", 2)
    assert m.get("a") == 1          # touch "a" → "b" is now LRU
    m.put("c", 3)                   # evicts "b"
    assert m.get("b") is None
    assert m.get("a") == 1
    assert m.get("c") == 3
    assert len(m) == 2


def test_cap_is_hard_bound():
    m = BoundedMemo(cap=8)
    for i in range(100):
        m.put(payload_key(str(i).encode()), i)
    assert len(m) == 8
    # newest entries survive
    assert m.get(payload_key(b"99")) == 99


def test_put_existing_key_updates_without_eviction():
    m = BoundedMemo(cap=2)
    m.put("a", 1)
    m.put("b", 2)
    m.put("a", 10)
    assert m.get("a") == 10
    assert m.get("b") == 2


def test_payload_key_is_small_and_stable():
    raw = b"x" * 1_000_000
    k1, k2 = payload_key(raw), payload_key(bytes(raw))
    assert k1 == k2
    assert len(k1) == 16
    assert payload_key(b"y") != k1


def test_text_key_handles_none_parts():
    assert text_key("manifest", None) == text_key("manifest", None)
    assert text_key("manifest", None) != text_key("manifest", "http://b")
    assert text_key("a", "b") != text_key("ab", "")


def test_cap_validation():
    import pytest

    with pytest.raises(ValueError):
        BoundedMemo(cap=0)
