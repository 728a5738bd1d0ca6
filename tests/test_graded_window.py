"""Registry hygiene for the driver's 50-slot grading window.

The driver grades exactly ``list(__spark_entry__.queries())[:50]``
(measured r01/r02). These tests make the window a deliberate diff:
any registration-order or curation change must touch
plans/graded.py::GRADED_50 explicitly.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry
from bigdata_invoice_stream_analysis_spark.plans.graded import GRADED_50
from bigdata_invoice_stream_analysis_spark.plans.queries import ORACLES, QUERIES

# Every round-5 window entry must carry an oracle: the three iterative
# ML fits (kmeans_anomalies / bisecting_anomalies / kmeans_elbow_sweep
# — no SQL-expressible oracle, so the driver could only record a
# rows-only check) all rotated out with four identical rows-only
# driver rows each (r01-r04); their slots went to hash-gated
# never-graded queries.
ROWS_ONLY: set[str] = set()


def test_window_is_the_checked_in_list():
    assert list(entry.queries())[:50] == GRADED_50


def test_window_has_50_unique_registered_names():
    assert len(GRADED_50) == 50
    assert len(set(GRADED_50)) == 50
    missing = [n for n in GRADED_50 if n not in QUERIES]
    assert not missing, f"graded names not in registry: {missing}"


def test_window_entries_have_oracles_except_iterative_ml():
    no_oracle = {n for n in GRADED_50 if n not in ORACLES}
    assert no_oracle == ROWS_ONLY


def test_reorder_loses_no_queries_or_oracles():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(QUERIES)
    assert set(os_) == set(ORACLES)
    assert set(os_) <= set(qs)


def test_rotation_covers_every_never_graded_query():
    """EVERY registered query with no driver row from any round BEFORE
    the one this window was curated for (GRADED_ROUND) must be in the
    window — the rotation's whole point is spending the scarce 50
    external slots on never-graded queries first (the round-6 closing
    property: after it, ever-graded == the full registry, and any
    query registered later must enter the window the round it lands).
    Scoped to earlier rounds so the check stays green after the driver
    writes this round's own CORRECTNESS file."""
    import json
    import re

    from bigdata_invoice_stream_analysis_spark.plans.graded import GRADED_ROUND

    root = Path(__file__).resolve().parents[1]
    ever: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        if rnd < GRADED_ROUND:
            ever |= set(json.loads(p.read_text()))
    never = sorted(set(QUERIES) - ever)
    left_out = [n for n in never if n not in GRADED_50]
    assert not left_out, f"never-graded queries missing a slot: {left_out}"


def test_no_row_goes_stale_beyond_four_rounds():
    """Freshness invariant (VERDICT r6 item 6): every registered query
    must either be in this round's window or have a driver grade at
    most 4 rounds old — the rotation must visit the whole registry on
    a bounded cadence, not just the squeaky wheels. A query whose
    newest row is from round GRADED_ROUND-5 or older and is NOT being
    re-graded this round fails."""
    import json
    import re

    from bigdata_invoice_stream_analysis_spark.plans.graded import GRADED_ROUND

    root = Path(__file__).resolve().parents[1]
    newest: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        if rnd < GRADED_ROUND:
            for name in json.loads(p.read_text()):
                newest[name] = max(newest.get(name, 0), rnd)
    stale = sorted(
        n
        for n, rnd in newest.items()
        if n in QUERIES and GRADED_ROUND - rnd > 4 and n not in GRADED_50
    )
    assert not stale, f"rows stale >4 rounds and not in the window: {stale}"
