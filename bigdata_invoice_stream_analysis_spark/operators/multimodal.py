"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas iterators
(mapInPandas) — the idiomatic Spark shape for media pipelines at scale.

The reference is text/CSV only (SURVEY.md §2.12); this is a north-star
extension (BASELINE.json). The container has no media libraries
(Pillow/librosa/av), so the actual codec step is STUBBED: decode_media
raises NotImplementedError for real codecs, and the tested path uses a
deterministic byte-level feature extractor (byte_stats) so schema,
partitioning, UDF signature, and Arrow batch shape — the Spark-side
plumbing — are fully real and oracle-checkable.

Scale design
------------
* Payloads stay columnar (binary in parquet) and are NEVER collected;
  mapInPandas streams Arrow record batches through the Python worker —
  constant memory per batch, no per-row pickling (~100× over row UDFs).
* spark.sql.files.maxPartitionBytes governs payload-scan granularity;
  for big media blobs, store pointers + range-read inside the iterator
  instead of inlining >100 MB cells.
* The extractor emits fixed-width numeric features, so downstream ops
  (dedup on media fingerprints, ANN on media embeddings) reuse the
  text/vector operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Canonical media row: opaque payload + typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("format", T.StringType(), True),  # png|wav|mp4|raw
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

BYTE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("byte_sum", T.LongType(), True),
        T.StructField("byte_min", T.IntegerType(), True),
        T.StructField("byte_max", T.IntegerType(), True),
        T.StructField("kind", T.StringType(), True),
    ]
)


def decode_media(payload: bytes, fmt: str) -> Any:
    """Real codec step — STUB. The container ships no media libraries;
    in production this dispatches to PIL/librosa/pyav behind the same
    mapInPandas iterator."""
    raise NotImplementedError(
        f"no media codec for {fmt!r} in this environment; "
        "use byte_stats / fake_decode for the tested plumbing"
    )


def fake_decode(payload: bytes) -> dict[str, int]:
    """Deterministic stand-in decoder: byte-level stats (exact integer
    math, reproducible anywhere — the oracle twin computes the same
    numbers from the source text)."""
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "byte_sum": 0, "byte_min": None, "byte_max": None}
    return {
        "n_bytes": len(payload),
        "byte_sum": sum(payload),
        "byte_min": min(payload),
        "byte_max": max(payload),
    }


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapt the documents table into the canonical media shape: the
    UTF-8 text bytes play the opaque payload (ASCII corpus → bytes ==
    char codes, which is what makes the oracle exact)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("raw").alias("format"),
            F.col("n_chars").cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )


def extract_byte_stats(media: DataFrame) -> DataFrame:
    """Feature-extract over the binary payload via mapInPandas: streams
    Arrow batches of (media_id, payload, meta) through a pandas
    iterator and emits BYTE_STATS_SCHEMA rows. This is the pattern a
    real decode/resize/frame-sample pipeline uses — swap fake_decode
    for decode_media and the plumbing is unchanged.

    The worker function is a self-contained closure (no references to
    this module's globals): cloudpickle then ships it BY VALUE, so the
    query runs no matter what sys.path/cwd the driver process has —
    Python workers never need to import this package."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        # Nested (pickled by value), NOT the module-level fake_decode:
        # a module-level function would serialize as a by-name import.
        def decode(payload):
            if payload is None or len(payload) == 0:
                return {"n_bytes": 0, "byte_sum": 0, "byte_min": None, "byte_max": None}
            return {
                "n_bytes": len(payload),
                "byte_sum": sum(payload),
                "byte_min": min(payload),
                "byte_max": max(payload),
            }

        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "byte_sum": [f["byte_sum"] for f in feats],
                    "byte_min": [f["byte_min"] for f in feats],
                    "byte_max": [f["byte_max"] for f in feats],
                    "kind": [m["kind"] if m is not None else None for m in pdf["meta"]],
                }
            )
            yield out

    return media.mapInPandas(batches, schema=BYTE_STATS_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one row per kept
    frame index (row-expanding mapInPandas — the batch shape of a real
    frame sampler). Frame count comes from metadata; payload slicing is
    left to the real codec."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, frames = [], []
            for mid, m in zip(pdf["media_id"], pdf["meta"]):
                n = (m or {}).get("n_frames") or 0
                for f in range(0, n, every_n):
                    ids.append(mid)
                    frames.append(f)
            yield pd.DataFrame({"media_id": ids, "frame_idx": frames})

    return media.mapInPandas(batches, schema=out_schema)


def resize_stub(
    media: DataFrame, target_w: int, target_h: int, resample: bool = False
) -> DataFrame:
    """Resize step of an image pipeline — stand-in for the PIL/opencv
    resample (decode_media documents the stub policy), in two modes:

    * default (``resample=False``): rewrite the meta dims only and pass
      the payload through untouched — the minimal stub for pipelines
      that only need the schema contract downstream;
    * ``resample=True``: deterministic nearest-neighbor over the
      payload treated as a width×height byte raster — output pixel
      (r, c) samples input byte (r*h//th)*w + (c*w//tw), the same index
      arithmetic a real NN resize does, so payload sizes, meta updates,
      and Arrow batch shapes behave exactly like production (every
      output payload is target_w*target_h bytes).

    Plan shape: pure mapInPandas (zero shuffle). The worker closure is
    self-contained (pickled by value — no package import needed on
    workers)."""
    out_schema = media.schema

    def batches(it: Iterator) -> Iterator:
        def nn_resize(payload, w, h):
            if payload is None or w is None or h is None or w <= 0 or h <= 0:
                return None
            raster = payload[: w * h].ljust(w * h, b"\x00")
            return bytes(
                raster[(r * h // target_h) * w + (c * w // target_w)]
                for r in range(target_h)
                for c in range(target_w)
            )

        for pdf in it:
            # MEDIA_SCHEMA permits a NULL meta struct: guard it here —
            # {**None} would throw inside the Arrow worker.
            metas = list(pdf["meta"])
            if resample:
                pdf["payload"] = [
                    None
                    if m is None
                    else nn_resize(p, m["width"], m["height"])
                    for p, m in zip(pdf["payload"], metas)
                ]
            pdf["meta"] = [
                None
                if m is None
                else {**m, "width": target_w, "height": target_h}
                for m in metas
            ]
            yield pdf

    return media.mapInPandas(batches, schema=out_schema)


def audio_chunk_stub(media: DataFrame, chunk_seconds: int = 2) -> DataFrame:
    """Audio-chunking stub: splits each audio payload into fixed-length
    windows (sample_rate × chunk_seconds samples ≅ bytes here — 8-bit
    mono stand-in) and emits one row per chunk with its byte span. The
    row-expanding mapInPandas shape is exactly a real chunker's
    (torchaudio/soundfile would decode `payload` instead of measuring
    it); spans are computed from metadata + payload length only, so the
    stub is deterministic and oracle-checkable."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("chunk_idx", T.IntegerType(), False),
            T.StructField("start_byte", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), False),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, idxs, starts, lens = [], [], [], []
            for mid, payload, m in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                rate = (m or {}).get("sample_rate") or 8000
                total = len(payload) if payload is not None else 0
                step = rate * chunk_seconds
                i = 0
                for start in range(0, total, step):
                    ids.append(mid)
                    idxs.append(i)
                    starts.append(start)
                    lens.append(min(step, total - start))
                    i += 1
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "start_byte": starts,
                    "n_bytes": lens,
                }
            )

    return media.mapInPandas(batches, schema=out_schema)
