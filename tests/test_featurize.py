"""Unit tests for operators.featurize (P6-P9, A1) — hand-computed
expectations per SURVEY.md §5.1, including the canonical-vs-weighted
mean (train/serve skew the reference had, SURVEY.md §3.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.operators.featurize import (
    aggregate_invoices,
    filter_features,
    invoice_features,
    with_derived_columns,
)
from bigdata_invoice_stream_analysis_spark.schemas import PURCHASE_SCHEMA


@pytest.fixture(scope="module")
def purchases(spark):
    rows = [
        # invoice A: two lines, 9:30 and 9:30 → Time 9.5
        ("A1", "S1", "D1", 2, "12/1/2010 9:30", 10.0, "17850", "UK"),
        ("A1", "S2", "D2", 6, "12/1/2010 9:30", 1.0, "17850", "UK"),
        # invoice B: single line, 14:45
        ("B2", "S3", "D3", 3, "12/2/2010 14:45", 4.0, "13047", "UK"),
        # cancelled
        ("C99", "S4", "D4", -3, "12/2/2010 15:00", 4.0, "13047", "UK"),
        # no customer
        ("D4", "S5", "D5", 1, "12/3/2010 10:00", 9.99, None, "UK"),
        ("D5", "S5", "D5", 1, "12/3/2010 10:00", 9.99, "  ", "UK"),
        # non-positive price
        ("E5", "S6", "D6", 5, "12/3/2010 11:00", 0.0, "12583", "FR"),
        # non-positive quantity sum
        ("F6", "S7", "D7", -5, "12/3/2010 12:00", 2.0, "12583", "FR"),
    ]
    return spark.createDataFrame(rows, PURCHASE_SCHEMA)


def by_invoice(df):
    return {r["InvoiceNo"]: r.asDict() for r in df.collect()}


def test_derived_columns(purchases):
    d = by_invoice(
        with_derived_columns(purchases).dropDuplicates(["InvoiceNo"]).select(
            "InvoiceNo", "Time", "HasCustomer"
        )
    )
    assert d["A1"]["Time"] == pytest.approx(9.5)
    assert d["B2"]["Time"] == pytest.approx(14.75)
    assert d["D4"]["HasCustomer"] == 0.0  # null customer
    assert d["D5"]["HasCustomer"] == 0.0  # whitespace customer
    assert d["A1"]["HasCustomer"] == 1.0


def test_aggregate_row_mean_vs_weighted(purchases):
    derived = with_derived_columns(purchases)
    row_mean = by_invoice(aggregate_invoices(derived))
    weighted = by_invoice(aggregate_invoices(derived, weighted_avg=True))
    # A1: prices 10 and 1, quantities 2 and 6
    assert row_mean["A1"]["AvgUnitPrice"] == pytest.approx(5.5)
    assert weighted["A1"]["AvgUnitPrice"] == pytest.approx((10 * 2 + 1 * 6) / 8)
    assert row_mean["A1"]["MinUnitPrice"] == 1.0
    assert row_mean["A1"]["MaxUnitPrice"] == 10.0
    assert row_mean["A1"]["NumberItems"] == pytest.approx(8.0)
    assert row_mean["A1"]["Time"] == pytest.approx(9.5)


def test_filter_features(purchases):
    feats = invoice_features(purchases)
    kept = set(by_invoice(feats))
    # C99 cancelled, D4/D5 no customer, E5 zero price, F6 negative qty
    assert kept == {"A1", "B2"}
    cols = feats.columns
    assert cols == [
        "InvoiceNo",
        "AvgUnitPrice",
        "MinUnitPrice",
        "MaxUnitPrice",
        "Time",
        "NumberItems",
    ]


def test_filter_is_nullsafe(spark):
    # a row with an unparseable date → NULL Time → filtered, not crashed
    rows = [("G7", "S1", "D1", 1, "not-a-date", 5.0, "17850", "UK")]
    df = spark.createDataFrame(rows, PURCHASE_SCHEMA)
    assert invoice_features(df).count() == 0
