#!/usr/bin/env python
"""Mechanical round-over-round bench comparison (VERDICT r6 item 3).

Compares a current BENCH_DETAIL.json against a baseline bench artifact
(default BENCH_r01.json — the recorded baseline per BASELINE.json's
acceptance rule) and prints one row per common query with the ratio,
consuming ``bench.WORKLOAD_CHANGED_SINCE_R01`` so queries whose input
corpus changed after the baseline are EXCLUDED from the same-workload
acceptance check instead of being re-adjudicated by prose every round
(the r6 false positive: embedding_dup_pairs read 2.13× vs its r01 row
because its corpus was augmented post-r01, code untouched).

For drain gates the current side prefers drain_min_of_3 (the
contention-robust point estimate bench.py records since r7).

Exit status: 0 when no same-workload query exceeds the threshold
(default 2.0×), 1 otherwise — so the check is a command, not a
judgement call.

Usage:
  python scripts/bench_compare.py [--baseline BENCH_r01.json]
                                  [--current BENCH_DETAIL.json]
                                  [--threshold 2.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_HERE)
sys.path.insert(0, _ROOT)

from bench import WORKLOAD_CHANGED_SINCE_R01  # noqa: E402


def _queries_of(artifact: dict) -> dict[str, float]:
    """Bench artifacts come in two shapes: the detail file (full map
    under "queries") and driver-recorded BENCH_r{N}.json (the parsed
    one-line JSON under "parsed", whose "queries" holds only the 10
    slowest since r3 — r01/r02 carried the full map)."""
    if "queries" in artifact and isinstance(artifact["queries"], dict):
        return dict(artifact["queries"])
    parsed = artifact.get("parsed") or {}
    return dict(parsed.get("queries") or {})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", default=os.path.join(_ROOT, "BENCH_r01.json"))
    ap.add_argument("--current", default=os.path.join(_ROOT, "BENCH_DETAIL.json"))
    ap.add_argument("--threshold", type=float, default=2.0)
    args = ap.parse_args()

    with open(args.baseline) as fh:
        base_art = json.load(fh)
    base = _queries_of(base_art)
    with open(args.current) as fh:
        cur_art = json.load(fh)
    cur = _queries_of(cur_art)
    drain_min = cur_art.get("drain_min_of_3", {})

    # Comparability gates, mirroring bench.py's own drift guard: a
    # cross-SF comparison is meaningless in BOTH directions (an sf0.01
    # smoke run overwriting BENCH_DETAIL.json would read as a huge
    # speedup and exit 0), so it is an ERROR, not a judgement.
    def _sf(a: dict):
        return a.get("sf", (a.get("parsed") or {}).get("sf"))

    if _sf(base_art) != _sf(cur_art):
        print(
            f"ERROR: SF mismatch — baseline sf={_sf(base_art)} vs "
            f"current sf={_sf(cur_art)}; re-run bench at the baseline SF",
            file=sys.stderr,
        )
        return 2
    # Dieted drain gates are only comparable under the same diet; the
    # baseline artifact predates the diet mechanism (no diet_keep_1_in
    # key), so any drain row dieted NOW is excluded rather than compared
    # against a full-volume baseline row.
    cur_dieted = set(cur_art.get("dieted") or [])
    if base_art.get("diet_keep_1_in") == cur_art.get("diet_keep_1_in"):
        cur_dieted = set()

    common = sorted(set(base) & set(cur))
    rows, over, skipped = [], [], []
    diet_skipped = []
    base_total = cur_total = 0.0
    for name in common:
        c = drain_min.get(name, cur[name])
        ratio = max(c, 0.001) / max(base[name], 0.001)
        if name in cur_dieted:
            diet_skipped.append(name)
            continue
        if name in WORKLOAD_CHANGED_SINCE_R01:
            skipped.append((name, ratio, WORKLOAD_CHANGED_SINCE_R01[name]))
            continue
        base_total += base[name]
        cur_total += c
        rows.append((name, base[name], c, ratio))
        if ratio > args.threshold:
            over.append(name)

    for name, b, c, r in sorted(rows, key=lambda x: -x[3]):
        flag = "  <-- OVER" if r > args.threshold else ""
        print(f"{name:40s} {b:8.2f}s -> {c:8.2f}s  {r:5.2f}x{flag}")
    for name, r, since in skipped:
        print(
            f"{name:40s} workload changed since baseline "
            f"(comparable from r{since:02d}) — excluded, nominal {r:.2f}x"
        )
    if diet_skipped:
        print(
            f"diet mismatch vs baseline — excluded: {sorted(diet_skipped)}"
        )
    print(
        f"\nsame-workload common={len(rows)}  total {base_total:.1f}s -> "
        f"{cur_total:.1f}s = {cur_total / max(base_total, 0.001):.2f}x  "
        f"over-{args.threshold}x: {len(over)} {over or ''}"
    )

    # Informational seat note (never changes the exit status): when
    # both artifacts carry bench.py's seat probe (recorded since r9),
    # print the seat-speed ratio so a uniform drift can be attributed
    # to the box instead of re-adjudicated from plan shapes. The
    # parallel-sha number is the proxy closest to Spark's multi-core
    # work; r9 evidence: a 1.46x median drift on 186 zero-churn rows
    # tracked the seat, not the code.
    def _seat_speed(a: dict) -> float | None:
        probe = (a.get("seat") or {}).get("probe_start") or {}
        v = probe.get("sha256_parallel_64mib_x_cpus_s")
        return float(v) if v else None

    sb, sc = _seat_speed(base_art), _seat_speed(cur_art)
    if sb and sc:
        seat_ratio = sc / sb
        print(
            f"seat: parallel-sha {sb:.3f}s -> {sc:.3f}s = "
            f"{seat_ratio:.2f}x slower seat; seat-normalized total = "
            f"{cur_total / max(base_total, 0.001) / seat_ratio:.2f}x"
        )
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main())
