#!/usr/bin/env python
"""Plan audit: regenerate PERF.md's shuffle/broadcast/pushdown table
from the live registry, so the plan-level claims stay reproducible
instead of hand-maintained.

For every auditable query, builds the DataFrame at $SPARK_GRAFT_SF_DIR
(default sf0.01), inspects the executed plan string — the same
artifact `.explain("formatted")` prints — and reports:

  shuffles   hash/range Exchange count (SinglePartition listed apart)
  bcast      BroadcastExchange count
  pushed     any non-empty PushedFilters at a parquet scan
  hazards    CartesianProduct / BroadcastNestedLoopJoin occurrences
             (BNLJ is legitimate ONLY against a bounded broadcast side
              — contrastive_negatives' 64-row pool, 1-row global aggs)

Queries whose CONSTRUCTION already executes work (streaming drains,
ML fits, layout-gate writes, driver-collected codebooks) are skipped
by default — their cost is execution, not plan shape, and several
write state as a side effect. Pass --all to audit them anyway.

Usage: python scripts/plan_audit.py [--all] [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_invoice_stream_analysis_spark.cache import release_caches
from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES
from bigdata_invoice_stream_analysis_spark.session import get_spark

# Construction of these EXECUTES (drains, fits, writes, collects) —
# plan text alone doesn't describe them, and building them has side
# effects; they are audited by their dedicated tests instead.
EXEC_HEAVY_PREFIXES = ("streaming_", "kmeans", "bisecting")
EXEC_HEAVY = {
    "partitioned_write_prune",
    "schema_evolution_merge",
    "bucketed_join_revenue",
    "ann_pq_topk",
    "ivf_cells_literal",
    "semdedup_drop",
    "embedding_top_pc",
    "equidepth_value_bins",
    "ann_ivf_topk",
    "ann_sq8_topk",
    "knn_label_vote",
    "ivf_cells",
    "media_resize_profile",
}


def audit_one(spark, name: str, sf_dir: str) -> dict:
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    n_single = sum("Exchange SinglePartition" in ln for ln in lines)
    n_exch = sum(
        ("Exchange hashpartitioning" in ln) or ("Exchange rangepartitioning" in ln)
        for ln in lines
    )
    n_bcast = plan.count("BroadcastExchange")
    # pushed=yes iff ANY scan carries a non-empty PushedFilters list —
    # checked per occurrence so a second, unfiltered scan in the same
    # plan (e.g. a dimension table read in full) can't mask a pushed one.
    pushed = any(
        m.strip() for m in re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    )
    hazards = []
    if "CartesianProduct" in plan:
        hazards.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in plan:
        hazards.append("BNLJ")
    return {
        "name": name,
        "shuffles": n_exch,
        "single": n_single,
        "bcast": n_bcast,
        "pushed": "yes" if pushed else "-",
        "hazards": ",".join(hazards) or "-",
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    audit_all = "--all" in sys.argv
    names = args or [
        n
        for n in QUERIES
        if audit_all
        or (n not in EXEC_HEAVY and not n.startswith(EXEC_HEAVY_PREFIXES))
    ]
    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"| query | shuffles | 1-part | bcast | pushed | hazards |")
    print(f"|---|---|---|---|---|---|")
    skipped = []
    for n in sorted(names):
        try:
            r = audit_one(spark, n, sf_dir)
        except Exception as e:  # keep auditing the rest
            skipped.append((n, f"{type(e).__name__}"))
            continue
        finally:
            release_caches()
        print(
            f"| {r['name']} | {r['shuffles']} | {r['single']} | {r['bcast']} "
            f"| {r['pushed']} | {r['hazards']} |"
        )
    for n, err in skipped:
        print(f"| {n} | build failed: {err} | | | | |")
    spark.stop()


if __name__ == "__main__":
    main()
