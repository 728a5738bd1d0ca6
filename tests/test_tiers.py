"""The round-9 registry-ceiling policy, test-enforced
(plans/tiers.py): tier membership, the sustainability bound, the
fingerprint pins, and the changed-code-re-pins-same-round rule.

These tests are the "checked-in policy note + the invariant test
encoding it" the r8 VERDICT demanded (item 1). Spark-free: pure AST/
hash work plus the CORRECTNESS history."""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry
from bigdata_invoice_stream_analysis_spark.plans import tiers
from bigdata_invoice_stream_analysis_spark.plans.graded import (
    GRADED_50,
    GRADED_ROUND,
)
from bigdata_invoice_stream_analysis_spark.plans.queries import ORACLES

ROOT = Path(__file__).resolve().parents[1]


def _grade_history() -> dict[str, list[tuple[int, dict]]]:
    out: dict[str, list[tuple[int, dict]]] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        if rnd >= GRADED_ROUND:
            continue
        for name, row in json.loads(p.read_text()).items():
            out.setdefault(name, []).append((rnd, row))
    return out


def test_tier_partition_is_total_and_disjoint():
    facing = set(entry.queries())
    assert tiers.FAST_PINS <= facing
    assert tiers.ROWS_ONLY_FAST <= facing
    assert not (tiers.FAST_PINS & tiers.ROWS_ONLY_FAST)
    # retirements really are out of the driver-facing registry
    assert not (tiers.RETIRED_FROM_DRIVER & facing)


def test_sustainability_bound():
    """Steady-state mandatory load = fast/5 + stable/9 must leave at
    least 10 of the 50 window slots free per round (the r8 VERDICT's
    'Done =' criterion) — any future registration wave that breaks
    this must re-price the policy deliberately."""
    facing = set(entry.queries())
    fast = len(facing & tiers.FAST_TIER)
    stable = len(facing - tiers.FAST_TIER)
    load = fast / (tiers.FAST_BOUND + 1) + stable / (tiers.STABLE_BOUND + 1)
    assert load <= 40, (
        f"steady-state mandatory load {load:.1f} leaves <10 free slots"
    )


def test_stable_tier_rows_have_clean_driver_evidence():
    """STABLE (8-round) cadence is earned, not granted: every stable
    row must have at least one hash-match driver grade and zero
    driver failures ever. Rows that cannot hash-match (rows-only ML)
    are FAST by policy."""
    hist = _grade_history()
    facing = set(entry.queries())
    bad: list[str] = []
    for name in sorted(facing - tiers.FAST_TIER):
        rows = hist.get(name)
        if rows is None:
            # never graded: must hold a slot this round (rotation test
            # covers it); not yet stable-eligible either way
            assert name in GRADED_50, f"{name} never graded, no slot"
            continue
        n_hash = sum(1 for _, r in rows if r.get("hash_match"))
        n_fail = sum(
            1 for _, r in rows
            if r.get("err") not in (None, "no_oracle")
            or r.get("hash_match") is False
            or r.get("rows_match") is False
        )
        if n_hash < 1 or n_fail:
            bad.append(f"{name}(hash={n_hash},fail={n_fail})")
    assert not bad, f"stable rows lacking clean evidence: {bad}"


def test_fingerprints_match_pinned():
    """Any change to a row's builder, oracle, same-module helpers, or
    engine-module closure must update fingerprints.json in the same
    commit — code churn is never silent."""
    pins = tiers.load_pins()
    qs = entry.queries()
    assert set(pins) == set(qs), (
        sorted(set(pins) ^ set(qs)))
    drifted = [
        n for n, fn in qs.items()
        if tiers.fingerprint(n, fn, ORACLES.get(n)) != pins[n]["fp"]
    ]
    assert not drifted, (
        "fingerprint drift without a pin update (run "
        f"scripts/pin_fingerprints.py --round {GRADED_ROUND}): {drifted}"
    )


def test_changed_rows_hold_a_window_slot_this_round():
    """The standing changed-code re-pin rule, enforced: every row
    whose fingerprint was pinned THIS round (i.e. its code changed or
    it registered this round) must be in this round's grading
    window — or, when the round's mandatory set overflows the 50-slot
    window, in the bounded one-round deferral
    (tiers.DEFERRED_REPINS, eligibility asserted separately)."""
    pins = tiers.load_pins()
    missing = sorted(
        n for n, p in pins.items()
        if p["round"] >= GRADED_ROUND
        and n not in GRADED_50
        and tiers.DEFERRED_REPINS.get(n) != GRADED_ROUND + 1
    )
    assert not missing, f"changed rows with no window slot: {missing}"


def test_deferred_repins_are_eligible_and_bounded():
    """The r9 deferral amendment's guardrails: a deferral is only
    legal when the row is STABLE tier (never FAST), meets the stable
    tier's own evidence bar (at least one clean hash-match driver
    grade, zero driver failures ever — the same bar stable cadence is
    earned at), is not never-graded, would not breach its stable
    staleness bound by its due round, and is due EXACTLY one round
    after the window that displaced it. Once GRADED_ROUND reaches a
    row's due round, the row must hold a window slot (the debt cannot
    roll)."""
    hist = _grade_history()
    for name, due in tiers.DEFERRED_REPINS.items():
        assert name not in tiers.FAST_TIER, f"{name}: FAST cannot defer"
        rows = hist.get(name)
        assert rows, f"{name}: never-graded rows cannot defer"
        n_hash = sum(1 for _, r in rows if r.get("hash_match"))
        n_fail = sum(
            1 for _, r in rows
            if r.get("err") not in (None, "no_oracle")
            or r.get("hash_match") is False
            or r.get("rows_match") is False
        )
        assert n_hash >= 1 and n_fail == 0, (
            f"{name}: deferral needs >=1 clean grade, 0 failures "
            f"(has hash={n_hash}, fail={n_fail})"
        )
        newest = max(rnd for rnd, _ in rows)
        assert newest + tiers.STABLE_BOUND >= due, (
            f"{name}: deferral to r{due} would breach the stable bound"
        )
        assert due <= GRADED_ROUND + 1, (
            f"{name}: deferral may only reach the NEXT round"
        )
        if GRADED_ROUND >= due:
            assert name in GRADED_50, (
                f"{name}: deferred re-grade came due at r{due} and "
                f"must hold a window slot"
            )


def test_no_pin_round_from_the_future():
    pins = tiers.load_pins()
    late = [n for n, p in pins.items() if p["round"] > GRADED_ROUND]
    assert not late


def test_fingerprint_closure_reaches_the_engine():
    """Sanity on the mechanism itself: content_triage's closure must
    include the dispatch module and the parsers behind it, so parser
    churn provably lands in the fingerprint."""
    from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES

    fn = QUERIES["content_triage"]
    import ast
    import inspect
    import textwrap

    _, segs, aliases = tiers._module_segments(inspect.getsourcefile(fn))
    seeds: set[str] = set()
    seen: set[str] = set()
    frontier = [inspect.getsource(fn)]
    while frontier:
        src = frontier.pop()
        seeds |= tiers._closure_seeds(
            tiers._package_imports(ast.parse(textwrap.dedent(src))))
        for ref in sorted(tiers._names_in(src)):
            if ref in aliases:
                seeds |= tiers._closure_seeds({aliases[ref]})
            if ref in segs and ref not in seen:
                seen.add(ref)
                frontier.append(segs[ref])
    closure = tiers._transitive_closure(seeds)
    mods = set(closure)
    for needle in ("operators.sniff", "operators.eml", "operators.avi",
                   "operators.mp4", "operators.gif", "operators.webp"):
        assert any(m.endswith(needle) for m in mods), needle
    # and the infra boundary holds
    assert not any(m in tiers.INFRA_EXEMPT for m in mods)


def test_fingerprint_closure_covers_module_level_imports():
    """The r9-documented gap, closed in r10: a builder that reaches an
    engine module through a MODULE-level import alias (e.g.
    ``from pkg.operators import dedup as DD`` at the top of
    plans/pipelines.py, referenced as ``DD.jaccard_prefix_pairs``)
    must carry that module in its fingerprint closure, so an engine
    edit there forces the same-round re-pin like any other."""
    import ast
    import inspect
    import textwrap

    from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES

    fn = QUERIES["jaccard_prefix_filter"]
    _, segs, aliases = tiers._module_segments(inspect.getsourcefile(fn))
    assert "DD" in aliases and aliases["DD"].endswith("operators.dedup")
    seeds: set[str] = set()
    seen: set[str] = set()
    frontier = [inspect.getsource(fn)]
    while frontier:
        src = frontier.pop()
        seeds |= tiers._closure_seeds(
            tiers._package_imports(ast.parse(textwrap.dedent(src))))
        for ref in sorted(tiers._names_in(src)):
            if ref in aliases:
                seeds |= tiers._closure_seeds({aliases[ref]})
            if ref in segs and ref not in seen:
                seen.add(ref)
                frontier.append(segs[ref])
    closure = tiers._transitive_closure(seeds)
    assert any(m.endswith("operators.dedup") for m in closure)


def test_fingerprint_is_deterministic():
    from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES

    name = "invoice_features"
    a = tiers.fingerprint(name, QUERIES[name], ORACLES.get(name))
    b = tiers.fingerprint(name, QUERIES[name], ORACLES.get(name))
    assert a == b
