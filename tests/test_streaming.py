"""Streaming E2E + semantics tests (SURVEY.md §5.3-5.4).

Broker-free: the producer's dir-replay drops chunk files consumed by the
file source with maxFilesPerTrigger=1, so each chunk ≙ one micro-batch
(the deterministic stand-in for the reference's 20 s Kafka batches).
All queries run with trigger(availableNow=True) and block to completion.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.streaming import pipeline as P
from bigdata_invoice_stream_analysis_spark.streaming import scoring, sinks, state
from bigdata_invoice_stream_analysis_spark.streaming.producer import replay_to_dir
from bigdata_invoice_stream_analysis_spark.streaming.sources import file_lines_source


def line(inv, qty, date, price, cust="7", country="ES", stock="S1", desc="item"):
    return f"{inv},{stock},{desc},{qty},{date},{price},{cust},{country}"


# Chunk 1 (micro-batch 1): two invoices + dirt + a cancellation.
CHUNK1 = [
    line("I1", 2, "1/4/2011 9:15", "10.0"),
    line("I1", 1, "1/4/2011 9:20", "30.0"),
    line("I2", 5, "1/4/2011 10:00", "2.0"),
    line("C9", 1, "1/4/2011 10:01", "5.0"),  # cancelled
    "bad,line,with,7,fields,only,x",  # invalid: arity 7
    line("I3", "x", "1/4/2011 10:02", "1.0"),  # invalid: non-numeric qty
    line("I4", 1, "1/4/2011 10:03", "1.0", cust=""),  # invalid: empty field
]
# Chunk 2 (micro-batch 2): I1 gets more lines; I2 is quiet; new C-invoice.
CHUNK2 = [
    line("I1", 3, "1/4/2011 11:30", "20.0"),
    line("C9", 1, "1/4/2011 11:31", "5.0"),  # same cancelled invoice again
    line("C10", 2, "1/4/2011 11:32", "7.0"),
    # watermark pusher: far-future event closes all earlier windows
    line("I5", 1, "1/4/2011 23:59", "4.0"),
]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    src = tmp_path_factory.mktemp("stream_src")
    raw = src / "raw.csv"
    raw.write_text("\n".join(CHUNK1 + CHUNK2) + "\n")
    out = str(src / "chunks")
    n = replay_to_dir(str(raw), out, chunk=len(CHUNK1))
    assert n == len(CHUNK1) + len(CHUNK2)
    assert sorted(os.listdir(out)) == ["chunk-000000.txt", "chunk-000001.txt"]
    return out


def run_collect(spark, df, output_mode="update", checkpoint=None):
    """Run a streaming DF to completion, collecting (batch_id, rows)."""
    batches: list[tuple[int, list]] = []

    def collect(bdf, bid):
        batches.append((bid, bdf.collect()))

    q = sinks.foreach_batch_collector(
        df, collect, output_mode=output_mode, checkpoint=checkpoint,
        trigger_available_now=True,
    )
    # awaitTermination returns False on timeout WITHOUT raising — under
    # heavy machine load a silent timeout left `batches` incomplete and
    # failed downstream asserts confusingly. Make the timeout loud.
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError("streaming drain did not finish within 300s")
    return batches


def test_invalid_routing(spark, stream_dir):
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    batches = run_collect(spark, P.invalid_lines(lines), output_mode="append")
    got = sorted(r.value for _, rows in batches for r in rows)
    assert got == sorted(
        [CHUNK1[4], CHUNK1[5], CHUNK1[6]]
    ), "exactly the three dirty lines route to the invalid sink"


def test_cancellation_window_counts(spark, stream_dir):
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    counts = P.cancellation_counts(
        lines, window="8 minutes", slide="1 minute", watermark="1 minute",
        time_mode="event",
    )
    batches = run_collect(spark, counts, output_mode="append")
    rows = {
        (r.window_start.strftime("%H:%M"), r.n_cancelled)
        for _, bat in batches for r in bat
    }
    # C9 at 10:01 → 8 sliding windows [09:54..10:01]; C9+C10 at 11:31/11:32
    # → windows covering both (C9 counted once per window despite two
    # lines). The 23:59 event pushes the watermark past all of them.
    assert ("10:01", 1) in rows
    assert ("09:54", 1) in rows
    assert ("11:31", 2) in rows  # both C9 and C10 in-window
    assert ("11:25", 2) in rows
    # dedup within window: no window ever counts C9 twice
    assert all(n <= 2 for _, n in rows)


def test_customer_sessions(spark, stream_dir):
    """Native session_window sessionization: 30-min gap per customer.
    Customer 7's good lines land at 9:15, 9:20 / 10:00 / 11:30 / 23:59
    → sessions A (two lines), B, C; the 23:59 line pushes the watermark
    past A-C (append mode emits only closed sessions, so 23:59's own
    session stays open and unemitted)."""
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    sessions = P.customer_sessions(
        P.good_purchases(lines), gap="30 minutes", watermark="10 minutes"
    )
    batches = run_collect(spark, sessions, output_mode="append")
    rows = sorted(
        (r.session_start.strftime("%H:%M"), r.session_end.strftime("%H:%M"),
         r.n_lines, float(r.n_items), r.n_invoices)
        for _, bat in batches for r in bat
    )
    assert rows == [
        ("09:15", "09:50", 2, 3.0, 1),   # I1 ×2, window end = last event + gap
        ("10:00", "10:30", 1, 5.0, 1),   # I2
        ("11:30", "12:00", 1, 3.0, 1),   # I1 again, new session
    ]


def test_deduped_lines_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a line replayed in a later
    micro-batch (at-least-once redelivery) is emitted once; distinct
    lines all survive; an unparseable-time line passes through."""
    d = tmp_path / "chunks"
    d.mkdir()
    dup = line("55", 1, "1/4/2011 9:00", "2.0")
    (d / "chunk-000000.txt").write_text(
        "\n".join([dup, line("56", 1, "1/4/2011 9:05", "3.0")]) + "\n"
    )
    (d / "chunk-000001.txt").write_text(
        "\n".join([dup, line("57", 1, "1/4/2011 9:10", "4.0"), "no,time,here"]) + "\n"
    )
    lines_df = file_lines_source(spark, str(d), max_files_per_trigger=1)
    deduped = P.deduped_lines(lines_df, watermark="1 hour")
    batches = run_collect(spark, deduped, output_mode="append")
    got = sorted(r.value for _, bat in batches for r in bat)
    assert got == sorted([
        dup,
        line("56", 1, "1/4/2011 9:05", "3.0"),
        line("57", 1, "1/4/2011 9:10", "4.0"),
        "no,time,here",
    ])


def test_cancellation_matches(spark, tmp_path):
    """Stream-stream interval join: cancellations match the purchase
    lines of their base invoice within 2 h; older purchases don't."""
    d = tmp_path / "chunks"
    d.mkdir()
    (d / "chunk-000000.txt").write_text(
        "\n".join([
            line("77", 2, "1/4/2011 9:00", "10.0"),
            line("77", 1, "1/4/2011 9:30", "5.0"),
            line("C77", 1, "1/4/2011 10:00", "0.0"),   # within 2 h of both
            line("88", 1, "1/4/2011 8:00", "3.0"),
            line("C88", 1, "1/4/2011 11:00", "0.0"),   # 3 h later: no match
            line("99", 1, "1/4/2011 23:00", "1.0"),    # watermark pusher
        ]) + "\n"
    )
    lines = file_lines_source(spark, str(d))
    matches = P.cancellation_matches(lines, watermark="10 minutes", within="2 hours")
    batches = run_collect(spark, matches, output_mode="append")
    got = sorted(
        (r.InvoiceNo, r.purchase_ts.strftime("%H:%M"), r.cancel_ts.strftime("%H:%M"))
        for _, bat in batches for r in bat
    )
    assert got == [("77", "09:00", "10:00"), ("77", "09:30", "10:00")]


def test_invoice_updates_match_batch(spark, stream_dir):
    """Train/serve consistency: the streaming update-mode aggregation's
    final state equals the batch aggregation over the same lines."""
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    updates = P.invoice_updates(P.good_purchases(lines), weighted_avg=True)
    batches = run_collect(spark, updates, output_mode="update")
    final = {}
    for _, rows in batches:
        for r in rows:
            final[r.InvoiceNo] = r  # later batches overwrite

    # Batch twin over the same files.
    batch_lines = spark.read.text(stream_dir).select(
        F.col("value"), F.current_timestamp().alias("ingest_ts"),
        F.split("value", ",")[0].alias("key"),
    )
    expected = {
        r.InvoiceNo: r
        for r in P.invoice_updates(
            P.good_purchases(batch_lines), weighted_avg=True
        ).collect()
    }
    assert set(final) == set(expected) == {"I1", "I2", "I5"}
    for k in expected:
        for col in ["AvgUnitPrice", "MinUnitPrice", "MaxUnitPrice", "Time",
                    "NumberItems", "Lines"]:
            assert final[k][col] == pytest.approx(expected[k][col]), (k, col)
    # weighted mean: I1 = (2·10 + 1·30 + 3·20) / 6
    assert final["I1"].AvgUnitPrice == pytest.approx(110.0 / 6)
    assert final["I1"].NumberItems == 6.0


def test_legacy_state_semantics(spark, stream_dir, tmp_path):
    """W2 exact semantics: per-batch emission, batch-count Lines,
    head-of-batch Time, weighted running mean across batches."""
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    updates = state.apply_invoice_state(P.good_purchases(lines))
    batches = run_collect(
        spark, updates, output_mode="update",
        checkpoint=str(tmp_path / "ckpt_state"),
    )
    assert len(batches) >= 2, "maxFilesPerTrigger=1 must yield 2+ micro-batches"
    by_batch = {bid: {r.InvoiceNo: r for r in rows} for bid, rows in batches}
    b1, b2 = by_batch[0], by_batch[1]

    # Batch 1: I1 seen with 2 lines (one fold), I2 with 1.
    assert set(b1) == {"I1", "I2"}
    assert b1["I1"].Lines == 1
    assert b1["I1"].AvgUnitPrice == pytest.approx((2 * 10 + 1 * 30) / 3)
    assert b1["I1"].Time == pytest.approx(9 + 15 / 60)  # head of batch 1
    # Batch 2: only updated keys emitted — I2 is quiet and absent.
    assert set(b2) == {"I1", "I5"}
    assert b2["I1"].Lines == 2
    assert b2["I1"].AvgUnitPrice == pytest.approx(110.0 / 6)
    assert b2["I1"].Time == pytest.approx(11 + 30 / 60)  # head of batch 2
    assert b2["I1"].MinUnitPrice == 10.0
    assert b2["I1"].MaxUnitPrice == 30.0
    assert b2["I1"].NumberItems == 6.0


def test_stream_anomaly_scoring(spark, stream_dir):
    """M3/M4 on the update stream: plan-literal centroid scoring flags
    exactly the far-from-centroid invoices."""
    centers = [[2.0, 2.0, 2.0, 10.0, 5.0], [20.0, 10.0, 30.0, 10.0, 4.0]]
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    updates = P.invoice_updates(P.good_purchases(lines), weighted_avg=True)
    flagged = scoring.anomalies_with_centroids(updates, centers, threshold=9.0)
    batches = run_collect(spark, flagged, output_mode="update")
    got = {r.InvoiceNo for _, rows in batches for r in rows}
    # I2 ≈ centroid0 (dist 0), I1-final ≈ centroid1 (dist < 9);
    # I5 (4,4,4,23.98,1) is far from both. I1's batch-1 interim state
    # (13.33,10,30,…) is also far — update-mode interim emissions flag it.
    assert "I5" in got
    assert "I2" not in got


def test_scoring_matches_numpy(spark):
    import numpy as np

    centers = [[1.0, 0.0, 2.0, 3.0, 4.0], [5.0, 5.0, 5.0, 5.0, 5.0]]
    rows = [(float(a), float(b), float(c), float(d), float(e))
            for a, b, c, d, e in np.random.default_rng(7).uniform(0, 8, (50, 5))]
    df = spark.createDataFrame(
        rows, ["AvgUnitPrice", "MinUnitPrice", "MaxUnitPrice", "Time", "NumberItems"]
    )
    got = scoring.score_with_centroids(df, centers).collect()
    c = np.array(centers)
    for r in got:
        v = np.array([r.AvgUnitPrice, r.MinUnitPrice, r.MaxUnitPrice, r.Time,
                      r.NumberItems])
        d = ((c - v) ** 2).sum(axis=1)
        assert r.prediction == int(d.argmin())
        assert r.dist == pytest.approx(float(d.min()))


def test_rate_source_shape(spark):
    from bigdata_invoice_stream_analysis_spark.streaming.sources import rate_lines_source

    df = rate_lines_source(spark, rows_per_second=10)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == ["key", "value", "ingest_ts"]


def test_state_v2_semantics(spark, stream_dir, tmp_path):
    """W2 on transformWithStateInPandas (state v2, RocksDB-backed):
    identical per-batch emission, Lines, head-of-batch Time, and
    weighted running mean as the applyInPandasWithState path. Skips
    where the protobuf wire dependency is absent (state.py gates it) —
    which no longer happens here: the miniproto shim
    (vendor/protobuf_shim) serves the wire protocol when the real
    package is missing, so this test EXECUTES state-v2 in this
    container; the JVM's Java-protobuf parser on the state server side
    is the wire-format interop oracle."""
    from bigdata_invoice_stream_analysis_spark.plans.drains import (
        rocksdb_provider,
    )
    from bigdata_invoice_stream_analysis_spark.vendor.protobuf_shim import install

    install()
    with rocksdb_provider(spark):
        lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
        updates = state.transform_invoice_state(P.good_purchases(lines))
        batches = run_collect(
            spark, updates, output_mode="update",
            checkpoint=str(tmp_path / "ckpt_state_v2"),
        )
    assert len(batches) >= 2
    by_batch = {bid: {r.InvoiceNo: r for r in rows} for bid, rows in batches}
    b1, b2 = by_batch[0], by_batch[1]
    assert set(b1) == {"I1", "I2"}
    assert b1["I1"].Lines == 1
    assert b1["I1"].AvgUnitPrice == pytest.approx((2 * 10 + 1 * 30) / 3)
    assert b1["I1"].Time == pytest.approx(9 + 15 / 60)
    assert set(b2) == {"I1", "I5"}
    assert b2["I1"].Lines == 2
    assert b2["I1"].AvgUnitPrice == pytest.approx(110.0 / 6)
    assert b2["I1"].MinUnitPrice == 10.0
    assert b2["I1"].MaxUnitPrice == 30.0
    assert b2["I1"].NumberItems == 6.0


def test_state_v2_shim_installs_and_serves_pb2():
    """The environment gate is gone: vendor/protobuf_shim always makes
    google.protobuf importable (real install wins; otherwise the
    miniproto shim), and the generated StateMessage_pb2 module loads
    and round-trips the exact request shapes the state-v2 client
    builds. The full JVM interop is test_state_v2_semantics."""
    from bigdata_invoice_stream_analysis_spark.vendor.protobuf_shim import install

    mode = install()
    assert mode in ("real", "shim")
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.statefulProcessorCall.setHandleState.state == sm.CLOSED
    # ttl presence latch: READING cmd.ttl must not serialize an empty
    # ttl message; SETTING a nested field must
    cmd = sm.StateCallCommand(stateName="s")
    _ = cmd.ttl
    no_ttl = cmd.SerializeToString()
    cmd.ttl.durationMs = 1234
    with_ttl = cmd.SerializeToString()
    assert len(with_ttl) > len(no_ttl)
    parsed = sm.StateCallCommand()
    parsed.ParseFromString(with_ttl)
    assert parsed.ttl.durationMs == 1234 and parsed.stateName == "s"


def test_kafka_option_assembly():
    """Broker-free Kafka smoke (VERDICT r01 §missing-2): the sandbox has
    no broker, so pin the exact option maps the reader/writer are built
    from — the untestable surface shrinks to the network itself."""
    from bigdata_invoice_stream_analysis_spark.streaming.sinks import kafka_writer_options
    from bigdata_invoice_stream_analysis_spark.streaming.sources import kafka_reader_options

    r = kafka_reader_options(
        "b1:9092,b2:9092", topic="purchases",
        starting_offsets="earliest", max_offsets_per_trigger=50_000,
    )
    assert r == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "purchases",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",  # Kafka options are strings
    }
    # default: unbounded batches are NOT silently configured
    assert "maxOffsetsPerTrigger" not in kafka_reader_options("b:9092")

    w = kafka_writer_options("b1:9092", "facturas_erroneas", "/ckpt/x")
    assert w == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "facturas_erroneas",
        "checkpointLocation": "/ckpt/x",
    }


def test_kafka_record_projection_schema(spark):
    """The Kafka sink contract: exactly (key string, value string)."""
    df = spark.createDataFrame(
        [("I1", 2, 10.5)], ["InvoiceNo", "Quantity", "UnitPrice"]
    )
    rec = sinks.to_kafka_records(df, key_col="InvoiceNo")
    assert rec.columns == ["key", "value"]
    assert dict(rec.dtypes) == {"key": "string", "value": "string"}


def test_enriched_purchases_stream_static(spark, stream_dir):
    """Stream-static broadcast enrichment: purchases pick up dim
    attributes; unknown customers survive with nulls."""
    dim = spark.createDataFrame(
        [("7", "GOLD", "ES")], "customer_id string, tier string, country string"
    ).drop("country")
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    enriched = P.enriched_purchases(P.good_purchases(lines), dim)
    batches = run_collect(spark, enriched, output_mode="append")
    rows = [r for _, bat in batches for r in bat]
    assert len(rows) == 5  # all good purchase lines across both chunks
    tiers = {r.InvoiceNo: r.tier for r in rows}
    assert tiers["I1"] == "GOLD"  # CustomerID 7 enriched
    assert all(r.tier == "GOLD" for r in rows if r.CustomerID == "7")


def test_idempotent_sink_exactly_once(spark, stream_dir, tmp_path):
    """Replaying a micro-batch into the idempotent sink overwrites its
    own partition instead of duplicating rows (exactly-once delivery
    from a replayable source)."""
    out = str(tmp_path / "out")
    lines = file_lines_source(spark, stream_dir, max_files_per_trigger=1)
    good = P.good_purchases(lines).select("InvoiceNo", "Quantity", "UnitPrice")
    q = sinks.idempotent_parquet_sink(
        good, out, str(tmp_path / "ckpt"), trigger_available_now=True
    )
    q.awaitTermination(120)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 == 5
    # Simulate a crash-replay of batch 0: rerun the SAME batch write.
    replay = first.filter(F.col("batch_id") == 0).drop("batch_id")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        replay.withColumn("batch_id", F.lit(0)).write.mode("overwrite").partitionBy(
            "batch_id"
        ).parquet(out)
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert spark.read.parquet(out).count() == n1, "replay must not duplicate"


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """Watermark semantics pinned: a cancellation arriving in a LATER
    micro-batch with an event time older than (max_ts - watermark) is
    dropped from the windowed counts — late data cannot resurrect a
    finalized window. The same cancellation arriving on time (batch 1)
    IS counted."""
    d = tmp_path / "chunks"
    d.mkdir()
    ckpt = str(tmp_path / "ckpt")
    batches: list = []

    def drain():
        # One availableNow drain per arrival, all sharing a checkpoint:
        # the watermark persists across restarts, and each drain sees
        # only files added since the last — a DETERMINISTIC arrival
        # order. (The file source's initial-listing order across
        # already-present files is not mtime/path-deterministic; the
        # single-dir form of this test flaked when the "late" chunk
        # happened to be listed first, before any watermark existed.)
        lines = file_lines_source(spark, str(d), max_files_per_trigger=1)
        counts = P.cancellation_counts(
            lines, window="8 minutes", slide="1 minute", watermark="1 minute",
            time_mode="event",
        )
        batches.extend(run_collect(
            spark, counts, output_mode="append", checkpoint=ckpt
        ))

    (d / "chunk-000000.txt").write_text(
        "\n".join([
            line("C1", 1, "1/4/2011 9:00", "1.0"),
            line("10", 1, "1/4/2011 12:00", "1.0"),  # watermark -> ~11:59
        ]) + "\n"
    )
    drain()
    (d / "chunk-000001.txt").write_text(
        # 9:05 is hours behind the 1-minute watermark: must be dropped.
        line("C2", 1, "1/4/2011 9:05", "1.0") + "\n"
    )
    drain()
    (d / "chunk-000002.txt").write_text(
        # pushes the watermark further so every window finalizes
        line("11", 1, "1/4/2011 23:00", "1.0") + "\n"
    )
    drain()
    windows = {
        (r.window_start.strftime("%H:%M"), r.n_cancelled)
        for _, bat in batches for r in bat
    }
    assert ("09:00", 1) in windows, "on-time C1 counted"
    assert not any(s == "09:05" for s, _ in windows), "late C2 dropped"
    assert all(n == 1 for _, n in windows)
