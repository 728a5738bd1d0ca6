"""Property-based tests (hypothesis): operator semantics pinned against
pure-Python models over generated inputs, batched so each example set
costs ONE Spark job.

These guard the invariants the DuckDB oracles rely on: the line-routing
predicates, the polynomial hash, tokenization, and the top-k threshold
rule must each match an independent reimplementation on arbitrary
inputs, not just the synthesized test corpus.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions.text import (
    HASH_MULT,
    HASH_P,
    poly_hash,
    tokenize,
)
from bigdata_invoice_stream_analysis_spark.operators import validate
from bigdata_invoice_stream_analysis_spark.operators.topk import kth_largest

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Field values: printable ASCII minus the comma (a comma would change
# the line's arity — covered separately by the arity cases).
field = st.text(
    st.characters(min_codepoint=32, max_codepoint=126, exclude_characters=","),
    max_size=8,
)
lines = st.lists(
    st.lists(field, min_size=1, max_size=12).map(",".join),
    min_size=1,
    max_size=60,
)


def py_invalid(line: str) -> bool:
    """Python model of validate.is_invalid_line(strict_numeric=True)."""
    f = line.split(",")
    if len(f) != 8 or "" in f:
        return True
    return not re.fullmatch(r"-?\d+", f[3]) or not re.fullmatch(
        r"-?\d+(\.\d+)?", f[5]
    )


@SETTINGS
@given(lines)
def test_invalid_line_matches_python_model(spark, batch):
    df = spark.createDataFrame([(l,) for l in batch], ["value"])
    got = [
        r.inv
        for r in df.select(
            validate.is_invalid_line(F.col("value")).alias("inv")
        ).collect()
    ]
    assert got == [py_invalid(l) for l in batch]


@SETTINGS
@given(lines)
def test_cancelled_line_matches_python_model(spark, batch):
    df = spark.createDataFrame([(l,) for l in batch], ["value"])
    got = [
        r.c
        for r in df.select(
            validate.is_cancelled_line(F.col("value")).alias("c")
        ).collect()
    ]
    assert got == [l.split(",")[0].startswith("C") for l in batch]


def py_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * HASH_MULT + ord(ch)) % HASH_P
    return h


@SETTINGS
@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=20), min_size=1, max_size=60))
def test_poly_hash_matches_python_model(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], ["t"])
    got = [r.h for r in df.select(poly_hash(F.col("t")).alias("h")).collect()]
    assert got == [py_poly_hash(s) for s in batch]


@SETTINGS
@given(st.lists(st.text(st.characters(min_codepoint=32, max_codepoint=126), max_size=30), min_size=1, max_size=40))
def test_tokenize_matches_python_model(spark, batch):
    df = spark.createDataFrame([(s,) for s in batch], ["t"])
    got = [r.toks for r in df.select(tokenize(F.col("t")).alias("toks")).collect()]
    expected = [
        [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t != ""]
        for s in batch
    ]
    assert got == expected


@SETTINGS
@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=50),
)
def test_kth_largest_matches_sorted(spark, values, k):
    df = spark.createDataFrame([(float(v),) for v in values], ["x"])
    got = kth_largest(df, "x", k)
    ranked = sorted(values, reverse=True)
    expected = float(ranked[min(k, len(ranked)) - 1])
    assert got == expected


# --- as-of join vs naive quadratic model ------------------------------------

asof_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # key
        st.integers(min_value=0, max_value=50),   # ts
        st.integers(min_value=0, max_value=999),  # payload/id
    ),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(asof_rows, asof_rows, st.booleans())
def test_asof_join_matches_quadratic_model(spark, lrows, rrows, strict):
    """asof_join (union + running last) must equal the brute-force
    definition: for each left row, the right row with max ts at/before
    (or strictly before) it, ties broken by max id."""
    from bigdata_invoice_stream_analysis_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for k, t, i in lrows], "k int, lts int, lid int"
    )
    right = spark.createDataFrame(
        [(k, t, i) for k, t, i in rrows], "k int, rts int, rid int"
    )
    got = {
        (r.k, r.lts, r.lid): (r.rid, r.r_ts_out)
        for r in asof_join(
            left,
            right.select("k", "rts", "rid", F.col("rts").alias("r_ts_out")),
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_cols=["rid", "r_ts_out"],
            strict=strict,
            tiebreak="rid",
        ).collect()
    }
    for k, lts, lid in set(lrows):
        cands = [
            (rt, ri)
            for rk, rt, ri in rrows
            if rk == k and (rt < lts if strict else rt <= lts)
        ]
        want = max(cands) if cands else None
        have = got[(k, lts, lid)]
        if want is None:
            assert have == (None, None)
        else:
            assert have == (want[1], want[0])


# --- connected components vs union-find -------------------------------------

edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.parametrize("impl", ["propagation", "star"])
@SETTINGS
@given(edge_lists)
def test_connected_components_match_union_find(spark, impl, edges):
    """Both component implementations — min-label propagation AND
    large-star/small-star contraction — must produce exactly the
    components a driver-side union-find computes, including
    self-loops, duplicate edges, and chains longer than the seeded
    first round."""
    from bigdata_invoice_stream_analysis_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    cc = connected_components if impl == "propagation" else connected_components_star
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.component
        for r in cc(df, "id_a", "id_b").collect()
    }
    assert got == want


# --- deterministic sampling -------------------------------------------------

@SETTINGS
@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                max_size=50, unique=True))
def test_split_partition_and_stability(spark, keys):
    """Every key lands in exactly one split; assignment is a pure
    function of the key (invariant under repartitioning/order)."""
    from bigdata_invoice_stream_analysis_spark.operators.sampling import with_split

    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    a = {r.doc_id: r.split for r in with_split(df, "doc_id").collect()}
    b = {
        r.doc_id: r.split
        for r in with_split(df.repartition(7), "doc_id").collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}
    assert len(a) == len(keys)


# ---------------------------------------------------------------------------
# Round-2 operators vs pure-Python models
# ---------------------------------------------------------------------------

activity = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 20)),  # (user, day_index)
    min_size=1,
    max_size=60,
)


@SETTINGS
@given(activity)
def test_rolling_active_users_matches_python_model(spark, acts):
    """7-day rolling distinct users == brute-force set arithmetic."""
    import datetime

    base = datetime.date(2024, 1, 1)
    rows = [
        (u, datetime.datetime(2024, 1, 1 + d, 12, 0))
        for u, d in acts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    au = df.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    cover = (
        au.select(
            "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "day"
        )
        .select("user_id", F.date_add(F.col("day"), F.col("i")).alias("cover_day"))
        .distinct()
    )
    days = df.select(F.col("ts").cast("date").alias("day")).distinct()
    got = {
        (r["day"].isoformat(), r["n"])
        for r in days.join(cover, days.day == cover.cover_day)
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # Python model
    by_day: dict[int, set] = {}
    for u, d in acts:
        by_day.setdefault(d, set()).add(u)
    want = set()
    for d in by_day:
        active = set()
        for back in range(7):
            active |= by_day.get(d - back, set())
        want.add(((base + datetime.timedelta(days=d)).isoformat(), len(active)))
    assert got == want


events_seq = st.lists(
    st.tuples(
        st.integers(0, 4),                      # user
        st.sampled_from(["signup", "click", "purchase", "view"]),
        st.integers(0, 100),                    # minute offset
    ),
    min_size=1,
    max_size=50,
)


@SETTINGS
@given(events_seq)
def test_funnel_counts_match_python_model(spark, evs):
    """Ordered funnel counts == per-user first-occurrence chain walk
    (and are monotone non-increasing by construction)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, t, base + datetime.timedelta(minutes=m), i)
        for i, (u, t, m) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp, event_id long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    s1 = df.select("user_id", "ts", "event_type", t1.alias("t1"))
    t2 = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    s2 = s1.select("*", t2.alias("t2"))
    t3 = F.min(
        F.when((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")), F.col("ts"))
    ).over(w)
    s3 = s2.select("*", t3.alias("t3"))
    per_user = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    row = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    ).first()
    # Python model
    from collections import defaultdict

    per = defaultdict(list)
    for u, t, m in evs:
        per[u].append((m, t))
    n1 = n2 = n3 = 0
    for u, items in per.items():
        items.sort()
        ts_signup = min((m for m, t in items if t == "signup"), default=None)
        if ts_signup is None:
            continue
        n1 += 1
        ts_click = min((m for m, t in items if t == "click" and m > ts_signup), default=None)
        if ts_click is None:
            continue
        n2 += 1
        if any(t == "purchase" and m > ts_click for m, t in items):
            n3 += 1
    assert (row["n1"], row["n2"], row["n3"]) == (n1, n2, n3)
    assert row["n1"] >= row["n2"] >= row["n3"]
