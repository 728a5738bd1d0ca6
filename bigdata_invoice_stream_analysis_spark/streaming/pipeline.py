"""Declarative streaming branch builders (SURVEY.md §2.5, §3.2).

Every function takes the normalized line stream (key, value, ingest_ts —
see sources.py) and returns an unbounded DataFrame; callers attach sinks
(sinks.py). All expressions are native Columns — the only Python in any
hot path is the optional legacy-exact state module (state.py).

Window-time modes (SURVEY.md §2.5 late-data note): the reference counts
by *arrival* time (processing-time DStream windows). The rebuild
defaults to *event* time parsed from InvoiceDate with a watermark — the
correct-at-scale semantics under replay/out-of-order arrival — and
keeps ``time_mode="processing"`` for reference-faithful behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.functions.time_fns import parse_invoice_ts
from bigdata_invoice_stream_analysis_spark.operators import validate

DEFAULT_WINDOW = "8 minutes"  # InvoicePipeline.scala:77 Minutes(8)
DEFAULT_SLIDE = "1 minute"  # InvoicePipeline.scala:77 Minutes(1)
DEFAULT_WATERMARK = "10 minutes"


def event_time(line: Column) -> Column:
    """Event time = parsed InvoiceDate (field 4) of the line. F.get, not
    [], so a short (invalid) line yields NULL instead of an ANSI
    out-of-bounds error."""
    return parse_invoice_ts(F.get(validate.split_line(line), 4))


def with_time(lines: DataFrame, time_mode: str = "event") -> DataFrame:
    """Attach the window-time column ``ts``."""
    if time_mode == "event":
        ts = event_time(F.col("value"))
    elif time_mode == "processing":
        ts = F.col("ingest_ts")
    else:
        raise ValueError(f"unknown time_mode {time_mode!r}")
    return lines.withColumn("ts", ts)


def invalid_lines(lines: DataFrame) -> DataFrame:
    """Branch 1 (P1 → W4): lines routed to the invalid sink
    (InvoicePipeline.scala:57-62). Stateless filter — no shuffle."""
    return lines.filter(validate.is_invalid_line(F.col("value"))).select(
        "key", "value"
    )


def cancellation_counts(
    lines: DataFrame,
    window: str = DEFAULT_WINDOW,
    slide: str = DEFAULT_SLIDE,
    watermark: str = DEFAULT_WATERMARK,
    time_mode: str = "event",
    exact: bool = True,
) -> DataFrame:
    """Branch 2 (P2 + A2 + A3 + W1): count of distinct cancelled
    invoices per sliding window (reduceByKeyAndWindow with inverse
    reduce, InvoicePipeline.scala:65-80).

    exact=True chains two stateful aggs — dedup on (window, InvoiceNo)
    then count per window — supported since Spark 3.4 with a watermark;
    state for both levels is purged as the watermark advances, unlike
    the reference whose manual inverse-reduce kept every key resident.
    exact=False uses one agg with approx_count_distinct — half the
    shuffle state, the right trade at very high cardinality.
    Output: window_start, window_end, n_cancelled (append mode).
    """
    # Watermark BEFORE the cancelled filter: the event-time high-water
    # mark must advance with the whole stream, not only with cancelled
    # lines — otherwise a lull in cancellations stalls window emission
    # forever even as good purchases keep flowing. Catalyst pushes any
    # conjunct that doesn't reference `ts` BELOW the EventTimeWatermark
    # node (PushPredicateThroughNonJoin), which would silently restrict
    # the watermark to cancelled rows — so the routing predicate is
    # wrapped in a single CASE WHEN over `ts`, which cannot be split or
    # pushed.
    keep = F.when(
        F.col("ts").isNotNull(),
        ~validate.is_invalid_line(F.col("value"))
        & validate.is_cancelled_line(F.col("value")),
    ).otherwise(F.lit(False))
    cancelled = (
        with_time(lines, time_mode)
        .withWatermark("ts", watermark)
        .filter(keep)
        .select(F.col("key").alias("InvoiceNo"), "ts")
    )
    w = F.window("ts", window, slide)
    if exact:
        per_invoice = cancelled.groupBy(w.alias("window"), "InvoiceNo").agg(
            F.count(F.lit(1)).alias("n_lines")
        )
        counts = per_invoice.groupBy("window").agg(
            F.count(F.lit(1)).alias("n_cancelled")
        )
    else:
        counts = cancelled.groupBy(w.alias("window")).agg(
            F.approx_count_distinct("InvoiceNo").alias("n_cancelled")
        )
    return counts.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_cancelled",
    )


def good_purchases(lines: DataFrame, time_mode: str = "event") -> DataFrame:
    """Branch 3 input (P3 + P4): typed purchase rows of good lines
    (InvoicePipeline.scala:133-134 + 85-90), with the ``ts`` column."""
    good = with_time(lines, time_mode).filter(
        validate.is_good_line(F.col("value"))
    )
    fields = validate.split_line(F.col("value"))
    return good.select(
        F.col("ts"),
        fields[0].alias("InvoiceNo"),
        fields[1].alias("StockCode"),
        fields[2].alias("Description"),
        fields[3].try_cast("int").alias("Quantity"),
        fields[4].alias("InvoiceDate"),
        fields[5].try_cast("double").alias("UnitPrice"),
        fields[6].alias("CustomerID"),
        fields[7].alias("Country"),
    )


def deduped_lines(
    lines: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    time_mode: str = "event",
) -> DataFrame:
    """A2 generalized across micro-batches: drop replayed duplicate
    lines within the watermark horizon via
    ``dropDuplicatesWithinWatermark``. The reference deduplicated only
    WITHIN one 20 s batch (reduceByKey, InvoicePipeline.scala:70-71) —
    an at-least-once Kafka source re-delivers lines across batch
    boundaries on recovery, which this absorbs. State is bounded by the
    watermark: a line's fingerprint is evicted once no duplicate can
    still arrive. Lines whose event time cannot be parsed are passed
    through (they route to the invalid sink downstream)."""
    wt = with_time(lines, time_mode)
    parsed = wt.filter(F.col("ts").isNotNull())
    unparsed = wt.filter(F.col("ts").isNull())
    deduped = parsed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["value"]
    )
    return deduped.unionByName(unparsed)


def customer_sessions(
    purchases: DataFrame,
    gap: str = "30 minutes",
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Gap-based per-customer sessionization with Spark's native
    ``session_window`` (absent from the reference — SURVEY.md §2.12
    lists session windows as an explicit gap; the batch twin is
    plans.queries.q_user_sessions).

    The state store merges overlapping windows per key as events
    arrive; the watermark closes a session once no event can extend it,
    so output is append-mode final sessions — at scale, state is
    O(open sessions), not O(events). Boundary note: an event exactly
    ``gap`` after the previous one starts a NEW session here (window
    span is half-open), while the batch twin's ``> gap`` rule keeps it
    — tests use non-boundary data.
    """
    return (
        purchases.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("w"),
            F.col("CustomerID"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("Quantity").cast("double").alias("n_items"),
            # exact count_distinct is unsupported in streaming aggs
            # (would need the full value set in state); the HLL sketch
            # is mergeable state — exact for small per-session counts
            F.approx_count_distinct("InvoiceNo").alias("n_invoices"),
        )
        .select(
            F.col("CustomerID"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_lines",
            "n_items",
            "n_invoices",
        )
    )


def cancellation_matches(
    lines: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    within: str = "2 hours",
    time_mode: str = "event",
) -> DataFrame:
    """Stream-stream interval join (absent from the reference —
    SURVEY.md §2.12): match each cancellation line ``C<no>`` to the
    purchase lines of invoice ``<no>`` that arrived up to ``within``
    before it. Both sides are branches of the SAME source stream.

    Scale semantics: watermarks on both sides plus the time-range join
    condition bound the join state — each side keeps only rows younger
    than watermark + ``within``, so state is O(recent traffic), not
    O(stream history). Output is append-mode (matches are final once
    the watermark passes)."""
    purchases = (
        good_purchases(lines, time_mode)
        .select(
            F.col("InvoiceNo"),
            F.col("ts").alias("purchase_ts"),
            F.col("Quantity"),
            F.col("UnitPrice"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    with_t = with_time(lines, time_mode)
    cancels = (
        with_t.filter(
            ~validate.is_invalid_line(F.col("value"))
            & validate.is_cancelled_line(F.col("value"))
        )
        .select(
            F.substring(
                F.get(validate.split_line(F.col("value")), 0), 2, 1_000_000
            ).alias("base_no"),
            F.col("ts").alias("cancel_ts"),
        )
        .withWatermark("cancel_ts", watermark)
    )
    return purchases.join(
        cancels,
        (F.col("InvoiceNo") == F.col("base_no"))
        & (F.col("cancel_ts") >= F.col("purchase_ts"))
        & (F.col("cancel_ts") <= F.col("purchase_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        "InvoiceNo", "purchase_ts", "cancel_ts", "Quantity", "UnitPrice"
    )


def invoice_updates(
    purchases: DataFrame,
    watermark: str | None = None,
    weighted_avg: bool = True,
) -> DataFrame:
    """A4 as a plain streaming aggregation (update output mode): the
    running per-invoice feature row, recomputed incrementally by the
    state store — only keys touched by a micro-batch are emitted.

    All aggregates are algebraic → map-side partial aggregation; shuffle
    volume per batch is O(invoices in batch), and the state store holds
    one small row per invoice (the reference cogrouped the ENTIRE state
    against every 20 s batch, InvoicePipeline.scala:136 — O(all keys)
    per batch).

    weighted_avg=True is the reference's streaming recurrence
    (InvoicePipeline.scala:110: quantity-weighted running mean); False
    matches batch-training row-mean semantics — the train/serve-skew
    flag (SURVEY.md §3.1), default chosen to match serving.

    Time semantics: mean fractional hour over all of the invoice's
    lines (the reference stored the hour of the *latest batch's head
    purchase* — an arrival-order artifact; state.py reproduces it).
    """
    from bigdata_invoice_stream_analysis_spark.functions.time_fns import fractional_hour

    if watermark:
        purchases = purchases.withWatermark("ts", watermark)
    if weighted_avg:
        avg_price = (
            F.sum(F.col("UnitPrice") * F.col("Quantity")) / F.sum("Quantity")
        ).alias("AvgUnitPrice")
    else:
        avg_price = F.avg("UnitPrice").alias("AvgUnitPrice")
    return purchases.groupBy("InvoiceNo").agg(
        avg_price,
        F.min("UnitPrice").alias("MinUnitPrice"),
        F.max("UnitPrice").alias("MaxUnitPrice"),
        F.avg(fractional_hour(F.col("ts"))).alias("Time"),
        F.sum("Quantity").cast("double").alias("NumberItems"),
        F.count(F.lit(1)).alias("Lines"),
        F.last("CustomerID").alias("CustomerID"),
    )


def enriched_purchases(
    purchases: DataFrame,
    customers: DataFrame,
    on_stream: str = "CustomerID",
    on_static: str = "customer_id",
) -> DataFrame:
    """Stream-static join (absent from the reference — SURVEY.md
    §2.12): enrich the purchase stream with customer dimension
    attributes. Left join keeps purchases whose customer is unknown
    (nulls beat dropped revenue rows in an enrichment).

    Scale semantics: the static side BROADCASTS — each micro-batch
    joins against the executor-local copy with no shuffle of the
    stream and, critically, NO join state (a static side needs no
    watermark bookkeeping: every batch re-reads the dim, which also
    means slowly-changing dims refresh mid-query when the underlying
    files change). A huge dim would instead be pre-bucketed on the key
    (sources.tables.write_bucketed) so each micro-batch co-locates."""
    dim = customers.withColumnRenamed(on_static, on_stream)
    return purchases.join(F.broadcast(dim), on_stream, "left")
