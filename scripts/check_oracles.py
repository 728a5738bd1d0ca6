#!/usr/bin/env python
"""Fast oracle-parity check for a subset of queries.

Usage: python scripts/check_oracles.py [sf_dir] [name_substr ...]
Mirrors the driver compare (sorted columns by name, floats rounded to
6, order-insensitive rows).
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bigdata_invoice_stream_analysis_spark.plans.queries import ORACLES, QUERIES
from bigdata_invoice_stream_analysis_spark.session import get_spark


def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    subs = sys.argv[2:]
    names = [
        n
        for n in sorted(ORACLES)
        if not subs or any(s in n for s in subs)
    ]
    spark = get_spark(app_name="check-oracles")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in names:
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(ORACLES[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
            o = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sn = sorted(tuple(norm(r[i]) for i in o) for r in srows)
            dn = sorted(tuple(norm(r[i]) for i in do) for r in drows)
            ok = sorted(scols) == sorted(dcols) and sn == dn
            print(name, len(srows), len(drows), "MATCH" if ok else "MISMATCH")
            if not ok:
                failures += 1
                if sorted(scols) != sorted(dcols):
                    print("  cols spark:", sorted(scols))
                    print("  cols duck :", sorted(dcols))
                else:
                    diff_s = [r for r in sn if r not in set(dn)][:3]
                    diff_d = [r for r in dn if r not in set(sn)][:3]
                    print("  only-spark:", diff_s)
                    print("  only-duck :", diff_d)
        except Exception:
            failures += 1
            print(name, "ERROR")
            traceback.print_exc(limit=4)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
