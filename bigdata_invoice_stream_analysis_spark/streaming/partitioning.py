"""Kafka-compatible key partitioning, broker-free.

The reference keys its four output topics by InvoiceNo
(InvoicePipeline.scala:141-147); which broker partition a record lands
on is decided by Kafka's DefaultPartitioner:

    partition = (murmur2(key_bytes) & 0x7fffffff) % num_partitions

Reimplementing that hash client-side matters for two production
patterns a Spark job uses without ever opening a socket:

  * **Co-partitioned produce**: ``df.repartition(n, kafka_partition_col
    (...))`` aligns Spark tasks with topic partitions, so each task
    produces to exactly one partition (sequential appends, no
    cross-partition interleaving, per-partition ordering preserved
    end-to-end for a keyed topic).
  * **Partition-affine consume joins**: a stream keyed the same way can
    be joined partition-local against a static side bucketed by the
    same function — no shuffle.

The hash here is bit-identical to ``org.apache.kafka.common.utils
.Utils.murmur2`` (Java client; seed 0x9747b28c, m=0x5bd1e995, r=24) —
pinned by the Kafka test vectors in tests/test_kafka_roundtrip.py, so
partitioner drift against real producers is a failing test, not a
silent reshuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_SEED = 0x9747B28C
_M = 0x5BD1E995
_R = 24
_MASK = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """Kafka's murmur2 over ``data``, returned as a SIGNED 32-bit int
    (matching the Java client's return value exactly, negative values
    included)."""
    length = len(data)
    h = (_SEED ^ length) & _MASK
    n4 = length & ~3
    for i in range(0, n4, 4):
        k = (
            data[i]
            + (data[i + 1] << 8)
            + (data[i + 2] << 16)
            + (data[i + 3] << 24)
        )
        k = (k * _M) & _MASK
        k ^= k >> _R
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k
    rem = length & 3
    if rem >= 3:
        h ^= (data[n4 + 2] & 0xFF) << 16
    if rem >= 2:
        h ^= (data[n4 + 1] & 0xFF) << 8
    if rem >= 1:
        h ^= data[n4] & 0xFF
        h = (h * _M) & _MASK
    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15
    return h - (1 << 32) if h >= (1 << 31) else h


def kafka_partition(key: str | bytes, num_partitions: int) -> int:
    """DefaultPartitioner for a non-null key: murmur2 masked positive,
    modulo the topic's partition count. String keys hash their UTF-8
    bytes — the encoding the sink applies on the wire."""
    if isinstance(key, str):
        key = key.encode("utf-8")
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


def kafka_partition_col(key, num_partitions: int) -> Column:
    """Column form of ``kafka_partition`` (vectorized Arrow batches —
    murmur2's 32-bit byte-mixing loop isn't expressible in native
    expressions, so this is a deliberate pandas_udf, used once per
    produced row). ``key`` is a string column or name."""

    @pandas_udf("int")
    def _part(keys: pd.Series) -> pd.Series:
        # Inlined hash (closure pickled by value — workers never import
        # this package), identical constants to murmur2 above.
        def h32(data: bytes) -> int:
            length = len(data)
            h = (0x9747B28C ^ length) & 0xFFFFFFFF
            n4 = length & ~3
            for i in range(0, n4, 4):
                k = (
                    data[i]
                    + (data[i + 1] << 8)
                    + (data[i + 2] << 16)
                    + (data[i + 3] << 24)
                )
                k = (k * 0x5BD1E995) & 0xFFFFFFFF
                k ^= k >> 24
                k = (k * 0x5BD1E995) & 0xFFFFFFFF
                h = (h * 0x5BD1E995) & 0xFFFFFFFF
                h ^= k
            rem = length & 3
            if rem >= 3:
                h ^= (data[n4 + 2] & 0xFF) << 16
            if rem >= 2:
                h ^= (data[n4 + 1] & 0xFF) << 8
            if rem >= 1:
                h ^= data[n4] & 0xFF
                h = (h * 0x5BD1E995) & 0xFFFFFFFF
            h ^= h >> 13
            h = (h * 0x5BD1E995) & 0xFFFFFFFF
            h ^= h >> 15
            return h

        return keys.map(
            lambda s: None
            if s is None
            else (h32(s.encode("utf-8")) & 0x7FFFFFFF) % num_partitions
        ).astype("Int32")

    return _part(F.col(key) if isinstance(key, str) else key)
