"""Bounded task-lifetime memo for pure decode results (r10, ADVICE).

The r9 distinct-payload memos (mediadecode / imagehash / hls / the
mediaops JPEG twin) keyed on the raw payload bytes with no size bound:
on codebooked corpora (10-118 distinct payloads) that is free, but at
100 TB with mostly-distinct payloads each task would accumulate every
distinct payload AND its decoded rows for the task's lifetime — a
guide-§5 memory risk. ``BoundedMemo`` fixes both failure modes:

* **digest keys** — entries key on a 16-byte BLAKE2b digest of the
  payload instead of the payload itself, so the memo retains only
  small keys and result tuples, never the heavy input bytes. Cost
  parity: a dict keyed on ``bytes`` already SipHashes the full
  payload per lookup, so one BLAKE2b pass per row is the same order
  of work, and the digest lookup after it is O(16 bytes).
* **LRU cap** — at most ``cap`` entries are retained (default 512,
  comfortably above every fixture codebook); on overflow the
  least-recently-used entry is evicted. Repeats in codebook-like
  data are adjacent, so the win survives eviction; on
  high-cardinality data the memo degrades to a bounded, mostly-miss
  cache instead of unbounded growth.

Failures are never memoized (callers memoize only successful decodes,
per the parser contract), and nothing outlives the task closure.
"""

from __future__ import annotations

import hashlib
from typing import Any

_DIGEST_SIZE = 16  # 128-bit BLAKE2b: collision-safe for memo keys


def payload_key(raw: bytes) -> bytes:
    """Small stable memo key for a heavy payload."""
    return hashlib.blake2b(raw, digest_size=_DIGEST_SIZE).digest()


def text_key(*parts: str | None) -> tuple:
    """Memo key for one-or-more text inputs (e.g. manifest + base
    URL): digests each non-None part so long texts are not retained."""
    return tuple(
        None if p is None
        else hashlib.blake2b(p.encode("utf-8", "surrogatepass"),
                             digest_size=_DIGEST_SIZE).digest()
        for p in parts
    )


class BoundedMemo:
    """Insertion-ordered dict LRU with O(1) get/put and a hard entry
    cap. Values are opaque; ``None`` is not a legal value (it means
    miss)."""

    __slots__ = ("_d", "cap")

    def __init__(self, cap: int = 512) -> None:
        if cap < 1:
            raise ValueError("cap must be >= 1")
        self._d: dict[Any, Any] = {}
        self.cap = cap

    def get(self, key: Any) -> Any | None:
        d = self._d
        v = d.get(key)
        if v is not None:
            # LRU touch: move to the most-recent end.
            del d[key]
            d[key] = v
        return v

    def put(self, key: Any, value: Any) -> Any:
        d = self._d
        if key in d:
            del d[key]
        elif len(d) >= self.cap:
            d.pop(next(iter(d)))  # evict least-recently-used
        d[key] = value
        return value

    def __len__(self) -> int:
        return len(self._d)
