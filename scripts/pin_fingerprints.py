#!/usr/bin/env python
"""Regenerate plans/fingerprints.json (the tier-policy change gate,
plans/tiers.py).

Usage:
    python scripts/pin_fingerprints.py --round N [name ...]

Recomputes the plan fingerprint of every driver-facing registered
query. Entries whose fingerprint is unchanged keep their pinned
round; changed or new entries get ``round = N`` — and
tests/test_tiers.py then requires each of those rows to hold a slot
in round N's grading window (the changed-code re-pin rule, enforced
rather than conventional). Passing explicit names restricts the
update to those rows (any other drifted row will fail the pin test,
which is the point: a drive-by code change cannot silently skip its
re-pin).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from bigdata_invoice_stream_analysis_spark.plans import tiers
    from bigdata_invoice_stream_analysis_spark.plans.graded import (
        ordered_queries,
    )
    from bigdata_invoice_stream_analysis_spark.plans.queries import ORACLES

    path = tiers._FINGERPRINT_PATH
    try:
        pins = json.loads(path.read_text())
    except FileNotFoundError:
        pins = {}

    qs = ordered_queries()
    target = set(args.names) if args.names else set(qs)
    changed, dropped = [], []
    out: dict[str, dict] = {}
    for name, fn in qs.items():
        fp = tiers.fingerprint(name, fn, ORACLES.get(name))
        prev = pins.get(name)
        if prev and prev["fp"] == fp:
            out[name] = prev
        elif name in target:
            out[name] = {"fp": fp, "round": args.round}
            changed.append(name)
        elif prev:
            out[name] = prev  # stale on purpose: the pin test will flag
            print(f"WARNING: {name} drifted but not in update set")
    for name in pins:
        if name not in qs:
            dropped.append(name)

    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"pinned {len(out)} rows; {len(changed)} new/changed @ "
          f"r{args.round}; {len(dropped)} dropped (deregistered)")
    if changed:
        print("changed:", " ".join(sorted(changed)))


if __name__ == "__main__":
    main()
