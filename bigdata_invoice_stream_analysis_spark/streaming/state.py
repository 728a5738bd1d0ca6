"""Legacy-exact keyed invoice state via applyInPandasWithState (W2/A4).

Reproduces ``updateInvoiceState`` (InvoicePipeline.scala:93-130)
semantics exactly, per micro-batch and per key:

  * quantity-weighted running mean:
      avg ← (avg·n + price·qty) / (n + qty), folded line by line;
  * running min/max of UnitPrice (seeded min=+inf, max=4.9e-324 — the
    reference's Double.MaxValue / Double.MinPositiveValue dummy,
    InvoicePipeline.scala:96);
  * Time = fractional hour of the *head purchase of this batch*
    (InvoicePipeline.scala:104-105 — an arrival-order artifact kept for
    fidelity; pipeline.invoice_updates is the order-free variant);
  * Lines = number of micro-batches that touched the invoice (the
    reference's ``previous.lines + 1``, InvoicePipeline.scala:126);
  * emits only keys that received data this batch (updateStateByKey
    returns None for quiet keys — which also DROPS their state,
    InvoicePipeline.scala:99; here an optional processing-time timeout
    reproduces that eviction, default keeps state — strictly more
    correct for invoices spanning quiet batches).

This is the one operator whose semantics genuinely need custom state —
Arrow-batched (not row-at-a-time), grouped by InvoiceNo so each state
row is ~60 bytes; with the RocksDB state store this scales to billions
of keys per Structured Streaming's state partitioning (state lives with
the shuffle partition that owns the key — no global rescan per batch,
unlike the reference's updateStateByKey cogroup).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from bigdata_invoice_stream_analysis_spark.schemas import INVOICE_STATE_SCHEMA

# Reference dummy-state seeds (InvoicePipeline.scala:96).
_SEED_MIN = float("inf")  # Double.MaxValue (dominates min identically)
_SEED_MAX = 4.9e-324  # Double.MinPositiveValue

_STATE_SCHEMA = (
    "avg double, mn double, mx double, number_items double, "
    "last_updated long, lines int"
)


def _make_updater(evict_after_ms: int | None):
    def update(
        key: tuple[str],
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Reference eviction: a batch with no new purchases for the
            # key returns None → state dropped (InvoicePipeline.scala:99).
            state.remove()
            return
        if state.exists:
            avg, mn, mx, number_items, _last, lines = state.get
        else:
            avg, mn, mx, number_items, lines = 0.0, _SEED_MIN, _SEED_MAX, 0.0, 0

        head_hour = 0.0
        customer = ""
        saw_data = False
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            if not saw_data:
                # Head purchase of this batch (InvoicePipeline.scala:104).
                head = pdf.iloc[0]
                ts = head["ts"]
                head_hour = (
                    0.0 if pd.isna(ts) else float(ts.hour + ts.minute / 60.0)
                )
                customer = str(head["CustomerID"])
                saw_data = True
            # Line-by-line weighted-mean fold (InvoicePipeline.scala:109-114).
            for price, qty in zip(pdf["UnitPrice"], pdf["Quantity"]):
                price, qty = float(price), float(qty)
                avg = (avg * number_items + price * qty) / (number_items + qty)
                mn = min(mn, price)
                mx = max(mx, price)
                number_items += qty
        if not saw_data:
            return
        lines += 1
        batch_ms = int(pd.Timestamp.utcnow().value // 1_000_000)
        state.update((avg, mn, mx, number_items, batch_ms, lines))
        if evict_after_ms is not None:
            state.setTimeoutDuration(evict_after_ms)
        yield pd.DataFrame(
            {
                "InvoiceNo": [key[0]],
                "AvgUnitPrice": [avg],
                "MinUnitPrice": [mn],
                "MaxUnitPrice": [mx],
                "Time": [head_hour],
                "NumberItems": [number_items],
                "LastUpdated": [batch_ms],
                "Lines": [int(lines)],
                "CustomerID": [customer],
            }
        )

    return update


def apply_invoice_state(
    purchases: DataFrame, evict_after_ms: int | None = None
) -> DataFrame:
    """W2 — the legacy-exact stateful aggregation. Input: good purchase
    rows with ``ts`` (pipeline.good_purchases). Output mode: update.

    evict_after_ms approximates the reference's drop-quiet-keys behavior
    with a processing-time timeout; None keeps state indefinitely.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_after_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return purchases.groupBy("InvoiceNo").applyInPandasWithState(
        _make_updater(evict_after_ms),
        outputStructType=INVOICE_STATE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
