"""prepared_purchase_lines r10 staging trim — equivalence pin.

The r10 shape pushes the two gate filters to the scans
(o_orderstatus <> 'F' ⟺ InvoiceNo NOT LIKE 'C%'; l_orderkey % 97 <> 0
⟺ CustomerID <> '') and derives ``ts`` directly from the join columns
instead of the date_format→try_to_timestamp roundtrip. This test pins
row-identity against the r9 shape rebuilt inline from purchase_rows,
so any future drift between the shared projection and the staged
drain input fails here rather than surfacing as a drain-gate oracle
mismatch."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_prepared_purchase_lines_matches_legacy_shape(spark):
    from bigdata_invoice_stream_analysis_spark.functions.time_fns import (
        parse_invoice_ts,
    )
    from bigdata_invoice_stream_analysis_spark.plans.drains import (
        prepared_purchase_lines,
    )
    from bigdata_invoice_stream_analysis_spark.plans.queries import (
        purchase_rows,
    )

    legacy = purchase_rows(spark, SF_DIR).filter(
        ~F.col("InvoiceNo").startswith("C") & (F.col("CustomerID") != "")
    ).select(
        "InvoiceNo",
        "CustomerID",
        F.col("Quantity").cast("double").alias("Quantity"),
        "UnitPrice",
        parse_invoice_ts(F.col("InvoiceDate")).alias("ts"),
        (F.col("line_no") % 3).alias("bkt"),
    )
    new = prepared_purchase_lines(spark, SF_DIR)
    assert legacy.schema == new.schema
    a = sorted(map(tuple, legacy.collect()))
    b = sorted(map(tuple, new.collect()))
    assert len(a) > 0
    assert a == b


def test_ts_roundtrip_identity_on_orders(spark):
    """parse(format(order_ts)) == order_ts exactly: order_ts is
    minute-granular (DATE + minutes), so the r9 string roundtrip and
    the r10 direct derivation are the same instant for every row."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    order_ts = F.timestamp_add(
        "MINUTE", (F.col("o_orderkey") % 1440).cast("int"),
        F.col("o_orderdate"),
    )
    rt = F.try_to_timestamp(
        F.date_format(order_ts, "MM/dd/yyyy HH:mm"),
        F.lit("MM/dd/yyyy HH:mm"),
    )
    bad = o.select(order_ts.alias("d"), rt.alias("r")).filter(
        F.col("r").isNull() | (F.col("d") != F.col("r"))
    )
    assert bad.count() == 0
