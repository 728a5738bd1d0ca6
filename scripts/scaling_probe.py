#!/usr/bin/env python
"""Scaling probe: times key operators at sf0.01, sf0.1, and a synthetic
5x-sf0.1 corpus (five id-shifted copies unioned in-memory), printing
the growth factor per decade of data. A sub-quadratic operator should
scale ~linearly in rows; anything super-linear beyond the log factors
flags a scale hazard long before a cluster run would.

Usage: python scripts/scaling_probe.py [sf_dir_small sf_dir_big]
SPARK_GRAFT_PROBE_ONLY=<substring> runs only the probes whose name
contains it (e.g. =state re-times just the two drain tiers).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.cache import release_caches
from bigdata_invoice_stream_analysis_spark.operators import dedup as DD
from bigdata_invoice_stream_analysis_spark.operators import graph as G
from bigdata_invoice_stream_analysis_spark.operators import similarity as SIM
from bigdata_invoice_stream_analysis_spark.session import get_spark
from bigdata_invoice_stream_analysis_spark.sources.tables import load_table


def docs_x(spark, sf_dir, mult=1):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if mult == 1:
        return d
    parts = [
        d.select((F.col("doc_id") + 10_000_000 * i).alias("doc_id"), "text")
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def vecs_x(spark, sf_dir, mult=1):
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", SIM.quantize(F.col("embedding")).alias("qv")
    )
    if mult == 1:
        return e
    parts = [
        e.select((F.col("vec_id") + 10_000_000 * i).alias("vec_id"), "qv")
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _chunk_dedup(corpus):
    from pyspark.sql.window import Window

    from bigdata_invoice_stream_analysis_spark.functions import text as TX

    ch = corpus.select(
        "doc_id", F.posexplode(TX.chunks(TX.tokenize(F.col("text")), 10)).alias("pos", "chunk")
    ).select("doc_id", (F.col("pos") + 1).alias("idx"), TX.poly_hash(F.col("chunk")).alias("h"))
    w = Window.partitionBy("h").orderBy("doc_id", "idx")
    return ch.withColumn("rn", F.row_number().over(w)).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("d")
    )


def _pii_audit(corpus):
    from bigdata_invoice_stream_analysis_spark.functions.pii import pii_audit

    return pii_audit(corpus)


def _lm_support(corpus):
    from bigdata_invoice_stream_analysis_spark.functions.ngram_lm import (
        lm_support,
    )

    return lm_support(corpus)


def _release_gate(corpus):
    from bigdata_invoice_stream_analysis_spark.functions.release import (
        corpus_release_gate,
    )

    return corpus_release_gate(corpus)


def _semdedup(vecs):
    # orderBy before limit: limit without ordering is partitioning-
    # dependent, which would make probe timings non-reproducible.
    cb = [
        (int(r["vec_id"]), [int(x) for x in r["qv"]])
        for r in vecs.filter(F.col("vec_id") % 97 == 0)
        .orderBy("vec_id").limit(60).collect()
    ]
    assigned = SIM.assign_cells_np(vecs, cb, "qv")
    return SIM.semdedup_cell_drops(assigned, tau=0.99)


def _pq_books(vecs):
    sampled = (
        vecs.filter(F.col("vec_id") % 149 == 0)
        .orderBy("vec_id").limit(40).collect()
    )
    return [
        [(int(r["vec_id"]), [int(x) for x in r["qv"][m * 8:(m + 1) * 8]]) for r in sampled]
        for m in range(8)
    ]


def _pq_encode(vecs):
    return SIM.pq_encode_np(vecs, _pq_books(vecs), "qv")


def _pq_topk(vecs):
    """End-to-end PQ ANN: capped codebook → Arrow encode → per-query
    ADC LUT → ranked top-5 (the full ann_pq_topk shape, so the probe
    times the whole family, not just the encode)."""
    from pyspark.sql.window import Window

    books = _pq_books(vecs)
    n_codes = len(books[0])
    encoded = SIM.pq_encode_np(vecs, books, "qv").drop("qv")
    qrows = sorted(
        vecs.filter(F.col("vec_id") < 5).collect(), key=lambda r: r["vec_id"]
    )
    queries = vecs.sparkSession.createDataFrame(
        [
            (int(r["vec_id"]), SIM.pq_adc_lut([int(x) for x in r["qv"]], books))
            for r in qrows
        ],
        "query_id long, lut array<long>",
    )
    adc = encoded.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        SIM.adc_from_lut_codes(
            F.col("lut"), F.col("codes"), n_codes, SIM.PQ_M
        ).alias("d"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("neighbor_id"))
    return adc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


def purchases_x(spark, sf_dir, mult=1):
    """Custom-state drain input at tier scale — the SAME builder the
    graded gate stages (plans/drains.prepared_purchase_lines); mult>1
    unions invoice-id-shifted copies so the state store carries mult×
    the keys."""
    from bigdata_invoice_stream_analysis_spark.plans.drains import (
        prepared_purchase_lines,
    )

    p0 = prepared_purchase_lines(spark, sf_dir)
    if mult == 1:
        return p0
    parts = [
        p0.withColumn(
            "InvoiceNo", F.concat(F.col("InvoiceNo"), F.lit(f"_{i}"))
        )
        for i in range(mult)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _custom_state_drain(spark, p):
    """Full drain cost: stage → 3 micro-batches of Arrow
    applyInPandasWithState → snapshot size (the graded
    streaming_custom_state shape, via the shared helper)."""
    from bigdata_invoice_stream_analysis_spark.plans.drains import (
        run_custom_state_drain,
    )

    return len(run_custom_state_drain(spark, p))


def _state_v2_drain(spark, p):
    """The same 3-micro-batch drain through transformWithStateInPandas
    (RocksDB provider, miniproto wire) — the graded streaming_state_v2
    shape. Separately tiered (keys, not SF): the v2 state server costs
    two protobuf socket round-trips per key per batch (get + update —
    already the minimum the semantics allow, so there is no in-processor
    batching left to take), which makes full-volume sf0.1 a 10-minute
    probe; the question VERDICT r04 asked is how that per-key cost
    SCALES with keys touched, so the tiers scale keys 50× instead."""
    from bigdata_invoice_stream_analysis_spark.plans.drains import (
        rocksdb_provider,
        run_custom_state_drain,
    )
    from bigdata_invoice_stream_analysis_spark.streaming.state import (
        transform_invoice_state,
    )

    with rocksdb_provider(spark):
        return len(
            run_custom_state_drain(
                spark, p, transform=transform_invoice_state,
                prefix="probe_state_v2",
            )
        )


def edges_x(spark, sf_dir, mult=1):
    """Symmetrized co-purchase edge set — the SAME builder the graded
    copurchase queries use (operators/graph.copurchase_edges), so the
    probe times the exact shipped graph; mult>1 unions id-shifted
    disconnected copies so per-round join+agg cost scales with edge
    count."""
    e0 = G.copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    if mult > 1:
        parts = [
            e0.select(
                (F.col("u") + 10_000_000 * i).alias("u"),
                (F.col("v") + 10_000_000 * i).alias("v"),
            )
            for i in range(mult)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        e0 = out
    return G.symmetrize(e0)


def timed(fn):
    t0 = time.perf_counter()
    n = fn()
    return time.perf_counter() - t0, n


def main():
    small = sys.argv[1] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")

    probes = {
        "minhash_lsh_pairs": lambda corpus: DD.minhash_lsh_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.2
        ).count(),
        "exact_dedup": lambda corpus: DD.exact_dup_groups(
            corpus, "doc_id", "text"
        ).count(),
        "simhash_pairs": lambda corpus: DD.simhash_pairs(
            corpus, "doc_id", "text"
        ).count(),
        "jaccard_prefix": lambda corpus: DD.jaccard_prefix_pairs(
            corpus, "doc_id", "text", n=3, threshold=0.2
        ).count(),
        "chunk_dedup": lambda corpus: _chunk_dedup(corpus).count(),
        "pii_audit": lambda corpus: _pii_audit(corpus).count(),
        "lm_support": lambda corpus: _lm_support(corpus).count(),
        "release_gate": lambda corpus: _release_gate(corpus).count(),
    }
    vec_probes = {
        "sign_lsh_pairs": lambda vecs: SIM.sign_lsh_pairs(
            vecs, id_col="vec_id", vec_col="qv", threshold=0.99, quantized=True
        ).count(),
        "semdedup": lambda vecs: _semdedup(vecs).count(),
        "pq_encode": lambda vecs: _pq_encode(vecs).count(),
        "pq_topk_e2e": lambda vecs: _pq_topk(vecs).count(),
    }
    edge_probes = {
        "pagerank_5rounds": lambda edges: G.pagerank_int(
            edges, iterations=5
        ).count(),
    }
    state_probes = {
        "custom_state_drain": lambda p: _custom_state_drain(spark, p),
    }

    only = os.environ.get("SPARK_GRAFT_PROBE_ONLY", "")
    if only:
        probes = {k: v for k, v in probes.items() if only in k}
        vec_probes = {k: v for k, v in vec_probes.items() if only in k}
        edge_probes = {k: v for k, v in edge_probes.items() if only in k}
        state_probes = {k: v for k, v in state_probes.items() if only in k}

    tiers = [("sf0.01", small, 1), ("sf0.1", big, 1), ("sf0.1 x5", big, 5)]
    # warm JIT on the small tier first (untimed)
    for name, fn in probes.items():
        fn(docs_x(spark, small))
        release_caches()
    for name, fn in vec_probes.items():
        fn(vecs_x(spark, small))
        release_caches()
    for name, fn in edge_probes.items():
        fn(edges_x(spark, small))
        release_caches()
    for name, fn in state_probes.items():
        fn(purchases_x(spark, small))
        release_caches()

    print(f"{'operator':<20} " + " ".join(f"{t[0]:>12}" for t in tiers) + "   growth/decade")
    for name, fn in probes.items():
        times = []
        for _, d, m in tiers:
            dt, n = timed(lambda: fn(docs_x(spark, d, m)))
            release_caches()
            times.append(dt)
        growth = times[1] / times[0] if times[0] else float("inf")
        print(
            f"{name:<20} " + " ".join(f"{t:>10.2f}s" for t in times)
            + f"   {growth:>6.1f}x per 10x rows, {times[2]/times[1]:.1f}x per 5x"
        )
    for name, fn in vec_probes.items():
        times = []
        for _, d, m in tiers:
            dt, n = timed(lambda: fn(vecs_x(spark, d, m)))
            release_caches()
            times.append(dt)
        print(
            f"{name:<20} " + " ".join(f"{t:>10.2f}s" for t in times)
            + f"   {times[1]/times[0]:>6.1f}x per 10x rows, {times[2]/times[1]:.1f}x per 5x"
        )
    for name, fn in edge_probes.items():
        times = []
        for _, d, m in tiers:
            dt, n = timed(lambda: fn(edges_x(spark, d, m)))
            release_caches()
            times.append(dt)
        print(
            f"{name:<20} " + " ".join(f"{t:>10.2f}s" for t in times)
            + f"   {times[1]/times[0]:>6.1f}x per 10x rows, {times[2]/times[1]:.1f}x per 5x"
        )
    for name, fn in state_probes.items():
        times = []
        for _, d, m in tiers:
            dt, n = timed(lambda: fn(purchases_x(spark, d, m)))
            release_caches()
            times.append(dt)
        print(
            f"{name:<20} " + " ".join(f"{t:>10.2f}s" for t in times)
            + f"   {times[1]/times[0]:>6.1f}x per 10x rows, {times[2]/times[1]:.1f}x per 5x"
        )

    # state-v2 wire-cost tiers (VERDICT r04 #7): keys scale 50× across
    # sf0.001 → sf0.01 → sf0.01×5 instead of riding the SF tiers —
    # the per-key protobuf round-trips make full sf0.1 a 10-minute
    # probe, and the question is cost-vs-keys-touched, not rows.
    if only and only not in "state_v2_drain":
        spark.stop()
        return
    tiny = small.replace("sf0.01", "sf0.001")
    if tiny == small or not os.path.isdir(tiny):
        # Custom argv dirs (no "sf0.01" substring) or a box without the
        # sf0.001 testdata: skip rather than silently re-running the
        # small tier under a mislabeled "sf0.001" heading.
        print("state_v2_drain        skipped (no sf0.001 dir next to "
              f"{small})")
        spark.stop()
        return
    v2_tiers = [("sf0.001", tiny, 1), ("sf0.01", small, 1), ("sf0.01 x5", small, 5)]
    _state_v2_drain(spark, purchases_x(spark, tiny))  # warm (untimed)
    release_caches()
    times = []
    keys = []
    for _, d, m in v2_tiers:
        dt, n = timed(lambda: _state_v2_drain(spark, purchases_x(spark, d, m)))
        release_caches()
        times.append(dt)
        keys.append(n)
    print(
        f"{'state_v2_drain':<20} "
        + " ".join(f"{t:>10.2f}s" for t in times)
        + f"   {times[1]/times[0]:>6.1f}x per {keys[1]/max(keys[0],1):.0f}x keys, "
        + f"{times[2]/times[1]:.1f}x per {keys[2]/max(keys[1],1):.0f}x keys"
    )
    spark.stop()


if __name__ == "__main__":
    main()
