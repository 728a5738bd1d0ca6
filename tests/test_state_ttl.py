"""State-v2 TTL lifecycle (round 5): engine-managed value-state TTL
(ttlDurationMs, RocksDB TTL column family, ProcessingTime timeMode)
exercised through the shared drain runner, plus the regression gate for
the r04 finding that availableNow NEVER terminates under ProcessingTime
timeMode (timer-evaluation batches keep scheduling; measured 167+ empty
batches in 90 s) — the drain must stop from the driver instead."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.plans.drains import (
    run_custom_state_drain,
)
from bigdata_invoice_stream_analysis_spark.streaming.state import (
    transform_invoice_state,
)


def _bucketed_fixture(spark):
    # I1 spans all three buckets, I2 only bucket 0, I3 only bucket 2.
    rows = [
        ("I1", "C1", 2.0, 10.0, 0),
        ("I2", "C2", 1.0, 5.0, 0),
        ("I1", "C1", 3.0, 20.0, 1),
        ("I1", "C1", 1.0, 30.0, 2),
        ("I3", "C3", 4.0, 7.0, 2),
    ]
    return spark.createDataFrame(
        rows,
        "InvoiceNo string, CustomerID string, Quantity double, "
        "UnitPrice double, bkt int",
    ).withColumn("ts", F.lit("2011-01-04 09:15:00").cast("timestamp"))


def test_ttl_drain_evicts_between_batches_and_terminates(spark):
    """With evict_after_ms=1 every micro-batch sees the previous state
    expired (consecutive batches are always >1 ms apart), so each key's
    final snapshot aggregates ONLY its last bucket and ``lines`` is
    reseeded to 1 — the deterministic surviving-window semantics the
    streaming_state_ttl oracle pins. The drain finishing at all IS the
    availableNow regression gate: stop_after_files must detect the 3
    consumed files and stop the otherwise-unbounded query."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    t0 = time.time()
    try:
        acc = run_custom_state_drain(
            spark,
            _bucketed_fixture(spark),
            transform=lambda s: transform_invoice_state(s, evict_after_ms=1),
            prefix="test_state_ttl",
            stop_after_files=True,
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert time.time() - t0 < 120  # stopped, not timer-batching forever
    assert dict(sorted(acc.items())) == {
        # last bucket only, lines reseeded — NOT the cross-batch fold
        # (which would be I1 -> (10.0, 30.0, 6.0, 3))
        "I1": (30.0, 30.0, 1.0, 1),
        "I2": (5.0, 5.0, 1.0, 1),
        "I3": (7.0, 7.0, 4.0, 1),
    }


def test_no_ttl_drain_still_terminates_under_available_now(spark):
    """Companion regression gate: without TTL, transform_invoice_state
    must keep timeMode="None" so the plain availableNow drain (the
    streaming_state_v2 path) terminates promptly — flipping it to
    ProcessingTime unconditionally would hang every v2 gate."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        acc = run_custom_state_drain(
            spark,
            _bucketed_fixture(spark),
            transform=transform_invoice_state,
            prefix="test_state_nottl",
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    # cross-batch fold: state survived all three micro-batches
    assert acc["I1"] == (10.0, 30.0, 6.0, 3)
    assert acc["I2"] == (5.0, 5.0, 1.0, 1)
    assert acc["I3"] == (7.0, 7.0, 4.0, 1)
