"""Salted two-phase aggregation: equals the direct groupBy on real data,
including a pathologically skewed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.operators.skew import salted_agg
from bigdata_invoice_stream_analysis_spark.sources.tables import load_table


def test_salted_agg_matches_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_agg(
        li,
        ["l_orderkey"],
        {
            "n": ("count", F.lit(1)),
            "qty": ("sum", F.col("l_quantity")),
            "pmin": ("min", F.col("l_extendedprice")),
            "pmax": ("max", F.col("l_extendedprice")),
        },
        n_salt=8,
    )
    direct = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("qty"),
        F.min("l_extendedprice").alias("pmin"),
        F.max("l_extendedprice").alias("pmax"),
    )
    s = {r.l_orderkey: r for r in salted.collect()}
    d = {r.l_orderkey: r for r in direct.collect()}
    assert set(s) == set(d)
    for k in d:
        assert s[k].n == d[k].n
        assert s[k].qty == pytest.approx(d[k].qty)
        assert s[k].pmin == d[k].pmin and s[k].pmax == d[k].pmax


def test_salted_agg_skewed_key(spark):
    # 100k rows on ONE key + a small tail: the shape that pins a single
    # reducer without salting.
    df = spark.range(100_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).alias("v")
    ).unionAll(
        spark.range(50).select(
            F.concat(F.lit("cold"), F.col("id")).alias("k"), F.lit(1).alias("v")
        )
    )
    out = {r.k: r for r in salted_agg(
        df, ["k"], {"n": ("count", F.lit(1)), "s": ("sum", F.col("v"))}, n_salt=32
    ).collect()}
    assert out["hot"].n == 100_000
    assert out["hot"].s == sum(i % 7 for i in range(100_000))
    assert out["cold0"].n == 1


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.range(10).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"bad": ("avg", F.col("v"))})


def test_legacy_tuple_records(spark):
    from bigdata_invoice_stream_analysis_spark.streaming.sinks import to_kafka_records

    df = spark.createDataFrame(
        [("I1", 1.5, 3)], ["key", "AvgUnitPrice", "Lines"]
    )
    row = to_kafka_records(df, legacy_tuple=True).first()
    assert row.key == "I1"
    assert row.value == "Invoice(1.5,3)"
    json_row = to_kafka_records(df).first()
    assert json_row.value == '{"AvgUnitPrice":1.5,"Lines":3}'
