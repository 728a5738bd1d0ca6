"""Focused pins for the r9 drain-gate sizing/transfer optimizations:
_drain_state_partitions (state partitions per gate family) and the
scratch-root medium selection."""

from __future__ import annotations

import os

import pytest

from bigdata_invoice_stream_analysis_spark import scratch
from bigdata_invoice_stream_analysis_spark.plans.queries import (
    _drain_state_partitions,
)


class _FakeSC:
    def __init__(self, cores: int) -> None:
        self.defaultParallelism = cores


class _FakeSpark:
    def __init__(self, cores: int) -> None:
        self.sparkContext = _FakeSC(cores)


@pytest.fixture(autouse=True)
def _no_env(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_DRAIN_STATE_PARTITIONS", raising=False)


def test_python_state_gets_owned_cores():
    assert _drain_state_partitions(_FakeSpark(32), python_state=True) == 32
    assert _drain_state_partitions(_FakeSpark(8), python_state=True) == 8


def test_python_state_caps_at_32():
    assert _drain_state_partitions(_FakeSpark(64), python_state=True) == 32


def test_jvm_state_quarters_owned_cores():
    # Per-store fixed cost dominates JVM gates at drain volume
    # (measured: stream-stream join 5.0 s @ 8 parts vs 10.2 s @ 32).
    assert _drain_state_partitions(_FakeSpark(32)) == 8
    # Floor of 2 so tiny seats still exercise multi-partition state.
    assert _drain_state_partitions(_FakeSpark(4)) == 2


def test_concurrent_queries_divide_cores():
    # A 4-sink topology's queries each own cores/4.
    assert (
        _drain_state_partitions(_FakeSpark(32), python_state=True, concurrent=4)
        == 8
    )
    assert (
        _drain_state_partitions(_FakeSpark(32), python_state=True, concurrent=3)
        == 10
    )


def test_env_override_wins(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_DRAIN_STATE_PARTITIONS", "200")
    assert _drain_state_partitions(_FakeSpark(32)) == 200
    assert _drain_state_partitions(_FakeSpark(32), python_state=True) == 200


def test_scratch_base_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_DIR", str(tmp_path))
    assert scratch._scratch_base() == str(tmp_path)


def test_scratch_base_prefers_tmpfs_or_default(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_DIR", raising=False)
    base = scratch._scratch_base()
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        assert base == "/dev/shm"
    else:
        assert base is None
