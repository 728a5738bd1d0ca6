#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <tag> <suffix> name [name ...]
Writes plans/<tag>/<name>_<suffix>.txt for each query. Queries whose
construction executes work (streaming drains, ML fits) are captured
as best-effort: construction side effects run, the final DataFrame's
plan is what the file records.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_invoice_stream_analysis_spark.cache import release_caches
from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES
from bigdata_invoice_stream_analysis_spark.session import get_spark


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump-plans-{tag}")
    rc = 0
    import contextlib
    import io

    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            # Public API only (r10 ADVICE: the private
            # PythonSQLUtils.explainString reach-in breaks across
            # Spark versions): capture df.explain() stdout.
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            rc = 1
            continue
        finally:
            release_caches()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
