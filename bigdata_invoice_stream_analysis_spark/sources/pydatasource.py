"""Custom Python DataSource (Spark 4 DataSource API): a deterministic,
DISTRIBUTED synthetic purchase-line generator.

Why this exists: load-testing the pipeline at arbitrary scale without
Kafka, files, or driver-side materialization. The reference's simulator
is a single-threaded 100-200 events/s producer
(InvoiceDataProducer.scala:28-36); this source generates each partition
ON ITS EXECUTOR as a pure function of (partition_id, row_index, seed) —
n partitions × m rows with zero data movement, so the generation rate
scales with the cluster, and the same (seed, rows, partitions) options
always produce byte-identical lines (replayable load tests).

Usage:
    spark.dataSource.register(PurchaseGenSource)
    df = (spark.read.format("purchase_gen")
          .option("rows", 100_000).option("partitions", 32).load())

Emits the 8-field raw CSV ``value`` lines the streaming parse path
consumes (same dirt taxonomy as the driver fixtures: arity errors,
empty CustomerID, non-numeric Quantity, 'C'-prefixed cancellations).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = "value string"


def gen_line(i: int, seed: int) -> str:
    """Row ``i`` of the deterministic purchase-line stream — pure
    arithmetic, shared by the batch reader (per-partition ranges on
    executors) and the streaming reader (per-micro-batch offset
    ranges), so batch and stream replay the IDENTICAL byte sequence."""
    h = (i * 2654435761 + seed) & 0xFFFFFFFF
    inv = f"{100000 + (i // 3)}"  # ~3 lines per invoice
    if h % 97 == 0:
        return f"{inv},S1,item,{1 + h % 5},bad"  # arity dirt
    qty = "x" if h % 89 == 0 else str(1 + h % 9)  # non-numeric quantity dirt
    cust = "" if h % 83 == 0 else str(1000 + h % 500)
    if h % 13 == 0:
        inv = "C" + inv  # cancellation
    hh, mm = (h >> 8) % 24, (h >> 13) % 60
    price = f"{(1 + h % 9000) / 100.0:.2f}"
    return (
        f"{inv},S{h % 50},item,{qty},"
        f"1/{1 + h % 28}/2011 {hh}:{mm:02d},{price},{cust},ES"
    )


class _Partition(InputPartition):
    def __init__(self, pid: int, start: int, end: int, seed: int):
        self.pid = pid
        self.start = start
        self.end = end
        self.seed = seed


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        parts = []
        start = 0
        for pid in range(self.n_parts):
            end = self.n_rows if pid == self.n_parts - 1 else min(
                self.n_rows, start + per
            )
            if start >= end:
                break
            parts.append(_Partition(pid, start, end, self.seed))
            start = end
        return parts

    def read(self, partition: _Partition):
        # Runs ON THE EXECUTOR: pure arithmetic per row index — no
        # state, no IO, deterministic for a fixed seed.
        for i in range(partition.start, partition.end):
            yield (gen_line(i, partition.seed),)


class _StreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the purchase generator (Spark 4's Python
    streaming DataSource API): offsets are plain row indices, each
    micro-batch emits the next ``rowsPerBatch`` lines of the SAME
    deterministic sequence the batch reader produces. Offsets make it
    replayable — after a checkpoint restart the engine re-asks for
    [start, end) via readBetweenOffsets and gets byte-identical rows,
    which is exactly the property exactly-once sinks need from a
    source. ``maxRows`` bounds the stream so availableNow-style tests
    terminate."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.max_rows = int(options.get("maxRows", 1000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self):
        return {"offset": 0}

    def read(self, start: dict):
        s = int(start["offset"])
        e = min(s + self.rows_per_batch, self.max_rows)
        # a LIST, not a generator: the engine prefetches these rows on
        # the driver and pickles them into the plan for the micro-batch
        return [(gen_line(i, self.seed),) for i in range(s, e)], {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return [
            (gen_line(i, self.seed),)
            for i in range(int(start["offset"]), int(end["offset"]))
        ]


class PurchaseGenSource(DataSource):
    """format("purchase_gen") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "purchase_gen"

    def schema(self) -> str | StructType:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
