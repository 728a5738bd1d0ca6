"""Drain-gate classification hygiene (r10 ADVICE).

bench.py times drain gates under a different protocol (fresh-JVM
min-of-3, input diet) than batch queries; it reads the checked-in
``plans/queries.DRAIN_GATES`` set. These tests recompute the
TRANSITIVE source scan (builder source, plus the source of any
plans-module helper the builder calls that itself reaches the diet
hook) and fail on any drift in either direction — a new gate, or a
refactor that routes the diet call through another shared helper,
must update the set in the same commit instead of silently landing in
the wrong timing cohort (the r8/r9 full-pipeline misclassification)."""

from __future__ import annotations

import inspect
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.plans import drains
from bigdata_invoice_stream_analysis_spark.plans.queries import (
    DRAIN_GATES,
    QUERIES,
)


def _scanned_gates() -> set[str]:
    """Names whose builder reaches _drain_input_diet, directly or via
    any plans.drains top-level helper (one transitive hop — the house
    style keeps drain plumbing in that module)."""
    helper_hits = {
        name
        for name, obj in vars(drains).items()
        if inspect.isfunction(obj)
        and obj.__module__ == drains.__name__
        and "_drain_input_diet(" in inspect.getsource(obj)
    }
    out: set[str] = set()
    for name, fn in QUERIES.items():
        src = inspect.getsource(fn)
        if "_drain_input_diet(" in src:
            out.add(name)
            continue
        if any(f"{h}(" in src for h in helper_hits):
            out.add(name)
    return out


def test_drain_gates_match_transitive_scan():
    scanned = _scanned_gates()
    assert scanned == set(DRAIN_GATES), (
        f"only-scan={sorted(scanned - set(DRAIN_GATES))} "
        f"only-set={sorted(set(DRAIN_GATES) - scanned)}"
    )


def test_drain_gates_are_registered_queries():
    missing = sorted(set(DRAIN_GATES) - set(QUERIES))
    assert not missing, missing
