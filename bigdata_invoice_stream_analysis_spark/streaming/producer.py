"""Replay producer simulator (S7, InvoiceDataProducer.scala:10-38).

The reference reads a CSV line-by-line and sends each line to Kafka
topic ``purchases`` keyed by field 0, sleeping 5-10 ms per event
(≈100-200 events/s ceiling). The rebuild:

  * ``replay_to_kafka`` — same behavior with an explicit ``--rate``
    (events/s; 0 = unthrottled) and a deterministic seed. Gated behind
    an import-try: no Kafka client ships in this environment.
  * ``replay_to_dir`` — broker-free mode for tests/CI: chunk the input
    into N-line files dropped into a directory consumed by
    sources.file_lines_source; each file ≙ one micro-batch when the
    reader sets maxFilesPerTrigger=1.

Usage:
    python -m bigdata_invoice_stream_analysis_spark.streaming.producer \
        --input production.csv --mode dir --out /tmp/stream_in --chunk 500
"""

from __future__ import annotations

import argparse
import os
import random
import time
from collections.abc import Iterable


def _lines(path: str, skip_header: bool) -> Iterable[str]:
    with open(path) as f:
        for i, line in enumerate(f):
            if skip_header and i == 0:
                continue
            line = line.rstrip("\n")
            if line:
                yield line


def replay_to_kafka(
    input_path: str,
    brokers: str = "localhost:9092",
    topic: str = "purchases",
    rate: float = 150.0,
    seed: int = 42,
    skip_header: bool = False,
) -> int:
    """Send each CSV line to Kafka keyed by field 0
    (InvoiceDataProducer.scala:30-32). Returns events sent."""
    try:
        from kafka import KafkaProducer  # type: ignore[import-not-found]
    except ImportError:  # pragma: no cover - no broker/client in CI
        raise NotImplementedError(
            "kafka-python is not installed in this environment; use "
            "mode='dir' (replay_to_dir) for broker-free replay"
        ) from None
    rng = random.Random(seed)
    producer = KafkaProducer(bootstrap_servers=brokers)
    n = 0
    for line in _lines(input_path, skip_header):
        key = line.split(",", 1)[0]
        producer.send(topic, key=key.encode(), value=line.encode())
        n += 1
        if rate > 0:
            # Reference jitter: sleep 5 + U(0,5) ms (PR:35); here scaled
            # so the mean sleep hits the requested rate.
            mean_s = 1.0 / rate
            time.sleep(mean_s * (0.5 + rng.random()))
    producer.flush()
    return n


def replay_to_dir(
    input_path: str,
    out_dir: str,
    chunk: int = 500,
    skip_header: bool = False,
) -> int:
    """Broker-free replay: write sequential chunk files into a
    streaming-source directory. Files are staged with a ``.tmp`` suffix
    and renamed so the file source never reads partial chunks."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    buf: list[str] = []
    chunk_id = 0
    base_ts = time.time()

    def flush() -> None:
        nonlocal chunk_id
        if not buf:
            return
        tmp = os.path.join(out_dir, f"chunk-{chunk_id:06d}.txt.tmp")
        dst = os.path.join(out_dir, f"chunk-{chunk_id:06d}.txt")
        with open(tmp, "w") as f:
            f.write("\n".join(buf) + "\n")
        # Strictly-increasing mtimes: the file source orders files by
        # modification time, and sub-ms writes would otherwise tie and
        # replay out of order.
        os.utime(tmp, (base_ts + chunk_id, base_ts + chunk_id))
        os.rename(tmp, dst)
        buf.clear()
        chunk_id += 1

    for line in _lines(input_path, skip_header):
        buf.append(line)
        n += 1
        if len(buf) >= chunk:
            flush()
    flush()
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--mode", choices=["kafka", "dir"], default="dir")
    ap.add_argument("--brokers", default="localhost:9092")
    ap.add_argument("--topic", default="purchases")
    ap.add_argument("--rate", type=float, default=150.0)
    ap.add_argument("--out", help="output dir (mode=dir)")
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skip-header", action="store_true")
    args = ap.parse_args()
    if args.mode == "kafka":
        n = replay_to_kafka(
            args.input, args.brokers, args.topic, args.rate, args.seed,
            args.skip_header,
        )
    else:
        if not args.out:
            ap.error("--out is required for mode=dir")
        n = replay_to_dir(args.input, args.out, args.chunk, args.skip_header)
    print(f"replayed {n} events")


if __name__ == "__main__":
    main()
