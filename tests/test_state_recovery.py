"""W2 state lifecycle across restarts: checkpoint recovery keeps keyed
state; the processing-time eviction timeout reproduces the reference's
drop-quiet-keys behavior (updateStateByKey returning None,
InvoicePipeline.scala:99)."""

from __future__ import annotations

import time

import pytest

from bigdata_invoice_stream_analysis_spark.streaming import pipeline as P
from bigdata_invoice_stream_analysis_spark.streaming import sinks, state
from bigdata_invoice_stream_analysis_spark.streaming.sources import file_lines_source


def _write_chunk(src, idx, lines):
    src.mkdir(exist_ok=True)
    p = src / f"chunk-{idx:06d}.txt"
    p.write_text("\n".join(lines) + "\n")
    import os

    os.utime(p, (1_700_000_000 + idx, 1_700_000_000 + idx))


def _run_once(spark, src, ckpt, evict_after_ms=None):
    lines = file_lines_source(spark, str(src), max_files_per_trigger=1)
    updates = state.apply_invoice_state(
        P.good_purchases(lines), evict_after_ms=evict_after_ms
    )
    rows = []

    def collect(bdf, bid):
        rows.extend(bdf.collect())

    q = sinks.foreach_batch_collector(
        updates, collect, output_mode="update", checkpoint=str(ckpt),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    return {r.InvoiceNo: r for r in rows}


def line(inv, qty, date, price):
    return f"{inv},S1,item,{qty},{date},{price},7,ES"


def test_state_survives_restart(spark, tmp_path):
    """Run 1 seeds I1's state; run 2 (same checkpoint, new file) folds
    into the RECOVERED state: weighted mean spans both runs."""
    src, ckpt = tmp_path / "in", tmp_path / "ckpt"
    _write_chunk(src, 0, [line("I1", 2, "1/4/2011 9:15", "10.0")])
    r1 = _run_once(spark, src, ckpt)
    assert r1["I1"].Lines == 1
    assert r1["I1"].AvgUnitPrice == pytest.approx(10.0)

    _write_chunk(src, 1, [line("I1", 2, "1/4/2011 11:00", "30.0")])
    r2 = _run_once(spark, src, ckpt)
    assert set(r2) == {"I1"}  # only the updated key emits
    assert r2["I1"].Lines == 2  # batch count carried over the restart
    assert r2["I1"].AvgUnitPrice == pytest.approx((2 * 10 + 2 * 30) / 4)
    assert r2["I1"].Time == pytest.approx(11.0)  # head of the new batch


def test_state_v2_survives_restart(spark, tmp_path):
    """transformWithStateInPandas twin of test_state_survives_restart:
    run 1 seeds I1's value state in the RocksDB store; run 2 starts a
    NEW streaming query against the same checkpoint and must fold the
    new file into the RECOVERED state — min/max/items/Lines all span
    both runs, proving the RocksDB snapshot restore works end-to-end
    through the miniproto wire (state server re-created per query)."""
    from bigdata_invoice_stream_analysis_spark.plans.drains import (
        rocksdb_provider,
    )

    src, ckpt = tmp_path / "in", tmp_path / "ckpt_v2"

    def run_v2():
        lines = file_lines_source(spark, str(src), max_files_per_trigger=1)
        updates = state.transform_invoice_state(P.good_purchases(lines))
        rows = []

        def collect(bdf, bid):
            rows.extend(bdf.collect())

        q = sinks.foreach_batch_collector(
            updates, collect, output_mode="update", checkpoint=str(ckpt),
            trigger_available_now=True,
        )
        q.awaitTermination(120)
        return {r.InvoiceNo: r for r in rows}

    with rocksdb_provider(spark):
        _write_chunk(src, 0, [line("I1", 2, "1/4/2011 9:15", "10.0")])
        r1 = run_v2()
        assert r1["I1"].Lines == 1
        assert r1["I1"].MinUnitPrice == pytest.approx(10.0)

        _write_chunk(src, 1, [line("I1", 2, "1/4/2011 11:00", "30.0")])
        r2 = run_v2()
    assert set(r2) == {"I1"}
    assert r2["I1"].Lines == 2  # batch count carried over the restart
    assert r2["I1"].MinUnitPrice == pytest.approx(10.0)  # recovered
    assert r2["I1"].MaxUnitPrice == pytest.approx(30.0)
    assert r2["I1"].NumberItems == pytest.approx(4.0)


def test_quiet_key_eviction(spark, tmp_path):
    """With evict_after_ms, a key that stays quiet past the timeout is
    dropped (reference None-return semantics): its next purchase starts
    from the dummy seed instead of folding into old state."""
    src, ckpt = tmp_path / "in", tmp_path / "ckpt"
    _write_chunk(src, 0, [line("I9", 2, "1/4/2011 9:15", "10.0")])
    r1 = _run_once(spark, src, ckpt, evict_after_ms=500)
    assert r1["I9"].Lines == 1

    time.sleep(1.5)  # let the processing-time timeout expire
    # two more batches: the first fires the timeout (I9 quiet), the
    # second brings I9 back.
    _write_chunk(src, 1, [line("OTHER", 1, "1/4/2011 10:00", "5.0")])
    r2 = _run_once(spark, src, ckpt, evict_after_ms=500)
    assert "I9" not in r2  # quiet key emits nothing while evicted

    _write_chunk(src, 2, [line("I9", 1, "1/4/2011 12:00", "40.0")])
    r3 = _run_once(spark, src, ckpt, evict_after_ms=500)
    # fresh state: Lines restarts at 1, average is the new batch only
    assert r3["I9"].Lines == 1
    assert r3["I9"].AvgUnitPrice == pytest.approx(40.0)
    assert r3["I9"].MinUnitPrice == pytest.approx(40.0)
