"""Unit tests: as-of join, connected components, deterministic splits.

The as-of join and components operators also have full cross-engine
oracle gates (time_since_error, dedup_components); these tests pin the
edge-case semantics on hand-built inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.operators.dedup import connected_components
from bigdata_invoice_stream_analysis_spark.operators.joins import asof_join
from bigdata_invoice_stream_analysis_spark.operators.sampling import (
    hash_sample,
    split_thresholds,
    with_split,
)


def _asof(spark, strict):
    left = spark.createDataFrame(
        [("k", 10, "l1"), ("k", 20, "l2"), ("k", 5, "l0"), ("x", 7, "lx")],
        "k string, ts long, lid string",
    )
    right = spark.createDataFrame(
        [("k", 10, "r10"), ("k", 10, "r10b"), ("k", 15, "r15"), ("y", 1, "ry")],
        "k string, rts long, rid string",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        right_cols=["rid", "rts"], strict=strict, tiebreak="rid",
    )
    return {r.lid: (r.rid, r.rts) for r in out.collect()}


def test_asof_strict(spark):
    m = _asof(spark, strict=True)
    # ts=10 must NOT see the rts=10 rows (strict <)
    assert m["l1"] == (None, None)
    assert m["l0"] == (None, None)
    # ts=20 sees rts=15 (latest strictly before)
    assert m["l2"] == ("r15", 15)
    # key with no right rows at all
    assert m["lx"] == (None, None)


def test_asof_inclusive_with_tiebreak(spark):
    m = _asof(spark, strict=False)
    # ts=10 matches rts=10; tie between r10/r10b broken by max rid
    assert m["l1"] == ("r10b", 10)
    assert m["l0"] == (None, None)
    assert m["l2"] == ("r15", 15)


def test_asof_single_shuffle(spark):
    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"), F.col("id").alias("lid")
    )
    right = left.select("k", "ts", F.col("lid").alias("rid"))
    plan = asof_join(
        left, right, on="k", left_ts="ts", right_ts="ts", right_cols=["rid"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round),
    # pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_split_deterministic_and_complete(spark):
    df = spark.range(2000).select(F.col("id").alias("k"))
    s1 = with_split(df, "k")
    counts = {r.split: r.c for r in s1.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # uniform md5 buckets: 80/10/10 within a few percent at n=2000
    assert abs(counts["train"] / 2000 - 0.8) < 0.04
    assert abs(counts["val"] / 2000 - 0.1) < 0.03
    # pure function of the key: same assignment on re-computation
    again = {r.k: r.split for r in with_split(df, "k").collect()}
    first = {r.k: r.split for r in s1.collect()}
    assert first == again


def test_hash_sample_is_subset_consistent(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    small = {r.k for r in hash_sample(df, "k", 0.1).collect()}
    big = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    assert small <= big  # nested samples: growing the rate keeps prior keys
    assert abs(len(big) / 1000 - 0.3) < 0.05


def test_split_thresholds_hex():
    t1, t2 = split_thresholds(0.8, 0.1)
    assert (t1, t2) == ("cccc", "e666")


def test_bloom_no_false_negatives_and_prunes(spark):
    """Bloom membership: every inserted key passes (no false
    negatives — the property that makes it a safe join pre-filter),
    and a disjoint probe set is mostly pruned (the 256 Kbit / k=2
    configuration keeps false positives rare at small n)."""
    from bigdata_invoice_stream_analysis_spark.operators import bloom as BLOOM

    build = spark.range(0, 500).select(F.col("id").alias("k"))
    bitmap = BLOOM.build_bitmap(build, "k")
    assert bitmap.count() <= BLOOM.N_BITS_DEFAULT // 64

    probe_in = spark.range(0, 500).select(F.col("id").alias("k"))
    flags_in = BLOOM.with_might_contain(probe_in, bitmap, "k").collect()
    assert all(r.might_contain for r in flags_in)

    probe_out = spark.range(10_000, 11_000).select(F.col("id").alias("k"))
    flags_out = BLOOM.with_might_contain(probe_out, bitmap, "k")
    n_fp = flags_out.filter(F.col("might_contain")).count()
    # 1000 keys × 2 hashes against 1000/262144 fill — expected FPs ≪ 10
    assert n_fp < 25


def test_weighted_keep_endpoints_rate_and_determinism(spark):
    """weighted_keep: weight=0 never keeps, weight=max always keeps,
    mid weights accept ≈ weight/max of keys, and the verdict is a pure
    function of (key, weight) — identical across repartitionings and
    equal to a driver-side md5 recomputation."""
    import hashlib

    from bigdata_invoice_stream_analysis_spark.operators import sampling as SP

    n = 4000
    df = spark.range(n).select(F.col("id").alias("k"))
    assert df.filter(SP.weighted_keep(F.col("k"), F.lit(0), 100)).count() == 0
    assert df.filter(SP.weighted_keep(F.col("k"), F.lit(100), 100)).count() == n

    kept = df.filter(SP.weighted_keep(F.col("k"), F.lit(25), 100))
    rate = kept.count() / n
    assert 0.20 < rate < 0.30  # ±5 pp of the 25% target at n=4000

    ids = sorted(r.k for r in kept.collect())
    ids_repart = sorted(
        r.k
        for r in df.repartition(13)
        .filter(SP.weighted_keep(F.col("k"), F.lit(25), 100))
        .collect()
    )
    assert ids == ids_repart

    def py_keep(k, weight, maxw):
        bucket = int(hashlib.md5(str(k).encode()).hexdigest()[:4], 16)
        return bucket * maxw < weight * 65536

    assert ids == [k for k in range(n) if py_keep(k, 25, 100)]


def test_merge_upsert_semantics(spark):
    """merge_upsert: delete removes, update replaces payload, insert
    appends, untouched base rows pass through; payload columns absent
    from the change feed always come from base."""
    from bigdata_invoice_stream_analysis_spark.operators.joins import merge_upsert

    base = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "d")],
        "k long, v long, tag string",
    )
    changes = spark.createDataFrame(
        [(2, "D", 0), (3, "U", 99), (9, "I", 900)],
        "k long, op string, v long",
    )
    got = sorted(
        (r["k"], r["v"], r["tag"]) for r in merge_upsert(base, changes, "k").collect()
    )
    assert got == [
        (1, 10, "a"),      # untouched
        (3, 99, "c"),      # updated v, tag (not in feed) kept from base
        (4, 40, "d"),      # untouched
        (9, 900, None),    # inserted; base-only column null
    ]


def test_merge_upsert_idempotent_replay(spark):
    """Applying the same compacted change feed twice equals applying it
    once — the invariant that makes MERGE safe under at-least-once
    delivery of a CDC stream (replayed batch re-applies cleanly)."""
    from bigdata_invoice_stream_analysis_spark.operators.joins import merge_upsert

    base = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 30)], "k long, v long"
    )
    changes = spark.createDataFrame(
        [(k, "D", 0) for k in range(1, 30, 7)]
        + [(k, "U", k * 100) for k in range(2, 30, 7)]
        + [(k, "I", k) for k in range(100, 103)],
        "k long, op string, v long",
    )
    once = merge_upsert(base, changes, "k")
    twice = merge_upsert(once, changes, "k")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_upsert_rejects_duplicate_change_keys(spark):
    """A change feed with two rows for one key must fail loudly (like
    Delta/Iceberg's multiple-source-rows MERGE error), not silently fan
    the base row out through the full-outer join."""
    import pytest

    from bigdata_invoice_stream_analysis_spark.operators.joins import merge_upsert

    base = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    dup = spark.createDataFrame(
        [(2, "U", 21), (2, "U", 22), (3, "I", 30)], "k long, op string, v long"
    )
    with pytest.raises(Exception, match="multiple change rows"):
        merge_upsert(base, dup, "k").collect()
    # and the same feed compacted to one row per key goes through
    ok = dup.groupBy("k").agg(
        F.max_by("op", "v").alias("op"), F.max("v").alias("v")
    )
    got = sorted((r["k"], r["v"]) for r in merge_upsert(base, ok, "k").collect())
    assert got == [(1, 10), (2, 22), (3, 30)]


# ---------------------------------------------------------------------------
# source_mixture_plan
# ---------------------------------------------------------------------------


def test_source_mixture_plan_hand_computed(spark):
    import math

    from bigdata_invoice_stream_analysis_spark.operators.sampling import (
        source_mixture_plan,
    )

    rows = [
        ("web", "a b c d"),       # 4 tokens
        ("web", "e f g h i j"),   # 6 → web 10
        ("books", "k l m n o"),   # books 5
        ("code", None),           # NULL text → 0 tokens
        ("code", "p q r s t u v w x y"),  # code 10
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["source"]: r for r in source_mixture_plan(df).collect()}
    totals = {"web": 10, "books": 5, "code": 10}
    total = 25
    wq = {s: round(1e9 * math.sqrt(n / total))
          for s, n in totals.items()}
    wsum = sum(wq.values())
    for s, n in totals.items():
        r = got[s]
        assert r["n_tokens"] == n
        assert r["token_share_ppm"] == round(1e6 * n / total)
        assert r["mix_weight_ppm"] == round(1e6 * wq[s] / wsum)
    # sqrt scaling up-weights the small source relative to raw share
    assert got["books"]["mix_weight_ppm"] > got["books"]["token_share_ppm"]
    assert got["code"]["n_docs"] == 2


def test_source_mixture_plan_rejects_pow_temperatures(spark):
    import pytest as _pytest

    from bigdata_invoice_stream_analysis_spark.operators.sampling import (
        source_mixture_plan,
    )

    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with _pytest.raises(ValueError, match="deterministic"):
        source_mixture_plan(df, temperature=0.7)
