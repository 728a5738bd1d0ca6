"""Registered analytic queries (driver contract: queries() + oracle_sql())."""

from bigdata_invoice_stream_analysis_spark.plans.queries import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
