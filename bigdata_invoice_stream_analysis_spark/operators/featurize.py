"""Batch featurization: purchase lines → per-invoice feature rows.

Reference: Clustering.scala:47-107 (featurizeData + filterData), i.e.
operators P6-P9 + A1 in SURVEY.md §2. This is the canonical feature
function shared by batch training and streaming scoring — the reference
has train/serve skew (row-mean vs quantity-weighted mean, SURVEY.md
§3.1); the rebuild picks ONE definition with a flag for the other.

Everything is a single declarative plan: Project → Filter → partial
HashAggregate → Exchange(InvoiceNo) → final HashAggregate → Filter.
At 100 TB the one shuffle on InvoiceNo is unavoidable (it IS the group
key); partial aggregation collapses each map task's lines first, so
shuffle volume is O(distinct invoices), not O(lines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions.time_fns import fractional_hour, parse_invoice_ts


def with_derived_columns(df: DataFrame) -> DataFrame:
    """P6 + P7 — add InvoiceTimestamp, Time (fractional hour) and
    HasCustomer (Clustering.scala:49-64)."""
    ts = parse_invoice_ts(F.col("InvoiceDate"))
    return (
        df.withColumn("InvoiceTimestamp", ts)
        .withColumn("Time", fractional_hour(F.col("InvoiceTimestamp")))
        .withColumn(
            "HasCustomer",
            F.when(
                F.col("CustomerID").isNull() | (F.trim(F.col("CustomerID")) == ""),
                F.lit(0.0),
            ).otherwise(F.lit(1.0)),
        )
    )


def aggregate_invoices(df: DataFrame, weighted_avg: bool = False) -> DataFrame:
    """A1 — group purchase lines by invoice (Clustering.scala:67-82).

    weighted_avg=False reproduces training semantics (row mean of
    UnitPrice); True uses the quantity-weighted mean the reference's
    streaming state maintains (InvoicePipeline.scala:110) — exposed so
    the train/serve-consistency test can pin both.
    Aggregates are all algebraic → map-side partial aggregation.
    """
    if weighted_avg:
        avg_price = (
            F.sum(F.col("UnitPrice") * F.col("Quantity")) / F.sum("Quantity")
        ).alias("AvgUnitPrice")
    else:
        avg_price = F.avg("UnitPrice").alias("AvgUnitPrice")
    return df.groupBy("InvoiceNo").agg(
        avg_price,
        F.min("UnitPrice").alias("MinUnitPrice"),
        F.max("UnitPrice").alias("MaxUnitPrice"),
        F.avg("Time").alias("Time"),
        F.sum("Quantity").cast("double").alias("NumberItems"),
        F.max("HasCustomer").alias("CustomerFound"),
    )


def filter_features(df: DataFrame) -> DataFrame:
    """P8 — training validity filter (Clustering.scala:87-107): drop
    cancelled invoices, null features, missing-customer rows,
    non-positive prices/items, Time outside [0,24]; drop the flag."""
    return df.filter(
        ~F.col("InvoiceNo").startswith("C")
        & F.col("AvgUnitPrice").isNotNull()
        & F.col("MinUnitPrice").isNotNull()
        & F.col("MaxUnitPrice").isNotNull()
        & F.col("Time").isNotNull()
        & F.col("NumberItems").isNotNull()
        & (F.col("CustomerFound") == 1.0)
        & (F.col("AvgUnitPrice") > 0)
        & (F.col("MinUnitPrice") > 0)
        & (F.col("MaxUnitPrice") > 0)
        & (F.col("NumberItems") > 0)
        & F.col("Time").between(0, 24)
    ).drop("CustomerFound")


def invoice_features(purchases: DataFrame, weighted_avg: bool = False) -> DataFrame:
    """Full featurization: typed purchase lines → clean per-invoice
    feature rows (columns: InvoiceNo, AvgUnitPrice, MinUnitPrice,
    MaxUnitPrice, Time, NumberItems)."""
    derived = with_derived_columns(purchases)
    # Pre-agg row filter: dropping cancelled lines BEFORE the shuffle
    # cuts shuffle volume; the reference filters post-agg only
    # (Clustering.scala:87-107) — same result because every line of a
    # "C" invoice shares the InvoiceNo prefix.
    derived = derived.filter(~F.col("InvoiceNo").startswith("C"))
    return filter_features(aggregate_invoices(derived, weighted_avg=weighted_avg))
