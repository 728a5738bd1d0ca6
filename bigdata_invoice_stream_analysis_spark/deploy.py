"""Ship this package to executor Python workers.

Most worker closures in this repo are self-contained (pickled by
value) so workers never import the package. That convention caps
closure size at a few dozen lines; operators that need a real library
surface on the workers (the baseline JPEG codec is ~450 lines) instead
ship the package itself — the same addPyFile mechanism a production
job uses to distribute its wheel to executors. Local mode included:
the Python workers are separate processes whose sys.path need not
contain the repo checkout."""

from __future__ import annotations

import os
import zipfile

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def package_zip() -> str:
    """Zip the package (py files only, package dir at zip root — the
    layout addPyFile's zipimport expects), cached in session scratch."""
    from bigdata_invoice_stream_analysis_spark.scratch import scratch_dir

    out = os.path.join(scratch_dir("pkg_zip"), f"{_PKG_NAME}.zip")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(_PKG_DIR):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.join(
                            _PKG_NAME, os.path.relpath(full, _PKG_DIR)
                        )
                        zf.write(full, rel)
        os.replace(tmp, out)
    return out


def ensure_package_on_workers(spark) -> None:
    """Idempotently addPyFile the package zip to this session."""
    sc = spark.sparkContext
    marker = "_spark_graft_pkg_added"
    if not getattr(sc, marker, False):
        sc.addPyFile(package_zip())
        setattr(sc, marker, True)
