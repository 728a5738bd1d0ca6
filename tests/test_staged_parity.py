"""Driver-compare parity for the round-9 STAGED queries
(plans/staged.py): the same sorted-columns / normalized-rows /
order-insensitive comparison the correctness driver applies to
registered queries, run over the staging area so registration in r9
is a mechanical move with the evidence already green."""

from __future__ import annotations

import datetime
import math
import os
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.plans.staged import (
    STAGED_ORACLES,
    STAGED_QUERIES,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else round(v, 6)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def test_registry_shape():
    assert set(STAGED_ORACLES) == set(STAGED_QUERIES)
    assert len(STAGED_QUERIES) >= 9


@pytest.mark.parametrize("name", sorted(STAGED_QUERIES))
def test_staged_query_matches_oracle(spark, duck, name):
    sdf = STAGED_QUERIES[name](spark, SF_DIR)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(STAGED_ORACLES[name])
    dcols = [d[0].lower() for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sn = sorted(tuple(_norm(r[i]) for i in so) for r in srows)
    dn = sorted(tuple(_norm(r[i]) for i in do) for r in drows)
    assert len(sn) == len(dn) and sn == dn
