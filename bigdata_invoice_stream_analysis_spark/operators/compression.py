"""Zstandard / LZ4 frame-structure profiling — the compression
formats large text corpora actually ship in (.jsonl.zst dumps,
.lz4-framed shards), walked at header level.

Neither codec's DECODER ships in the Python stdlib, so this module
draws the honest boundary the media parsers draw for inter-frame
video: the FRAMING is parsed completely from the public specs
(RFC 8878 for zstd frames; the LZ4 frame format spec), payloads are
never decompressed.  That is enough for the audit jobs a corpus
pipeline runs: is the blob a valid frame sequence, how many frames/
blocks, what window sizes (memory planning for the real decoder
fleet), are content sizes declared (splittability planning), is
there a dictionary dependency (provisioning), how much skippable-
frame metadata is embedded.

* zstd (RFC 8878): magic ``0xFD2FB528``; frame header descriptor →
  dictionary-ID / content-size field sizes, single-segment flag,
  window descriptor (exponent+mantissa), optional content checksum;
  block headers (3-byte LE: last-block bit, type raw/RLE/compressed,
  size) walked to the end of each frame — sizes make every block
  skippable without decoding, which is exactly how this walk works.
  Skippable frames (``0x184D2A5?``) are sized and skipped.
* lz4 frame: magic ``0x184D2204``; FLG/BD bytes (version, block
  independence, checksums, content size, dict ID), optional u64
  content size, header checksum byte; data blocks as u32 LE sizes
  with the high bit marking uncompressed blocks; ``0`` EndMark and
  optional content checksum.

Malformed framing raises ValueError (shared parser contract).

Reference: n/a (extension surface; staged round-9 lead — see
plans/graded.py docstring).
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
ZSTD_SKIPPABLE_LO = 0x184D2A50
LZ4_MAGIC = 0x184D2204


def parse_zstd_frames(data: bytes) -> list[dict]:
    """Walk every frame in a zstd stream: ``[{kind, offset,
    compressed_bytes, content_size, window_size, has_checksum,
    dict_id, n_blocks}]`` (kind ``frame`` or ``skippable``)."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("zstd: truncated magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == ZSTD_SKIPPABLE_LO:
            if pos + 8 > n:
                raise ValueError("zstd: truncated skippable header")
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + size > n:
                raise ValueError("zstd: skippable frame exceeds data")
            out.append({
                "kind": "skippable", "offset": pos,
                "compressed_bytes": 8 + size, "content_size": size,
                "window_size": None, "has_checksum": False,
                "dict_id": None, "n_blocks": 0,
            })
            pos += 8 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic at offset {pos}")
        start = pos
        pos += 4
        if pos >= n:
            raise ValueError("zstd: truncated frame header")
        fhd = data[pos]
        pos += 1
        dict_flag = fhd & 0x3
        checksum = bool(fhd & 0x4)
        if fhd & 0x8:
            raise ValueError("zstd: reserved FHD bit set")
        single_segment = bool(fhd & 0x20)
        fcs_flag = fhd >> 6
        window_size = None
        if not single_segment:
            if pos >= n:
                raise ValueError("zstd: truncated window descriptor")
            wd = data[pos]
            pos += 1
            exponent = wd >> 3
            mantissa = wd & 0x7
            base = 1 << (10 + exponent)
            window_size = base + (base // 8) * mantissa
        dict_id = None
        dsize = (0, 1, 2, 4)[dict_flag]
        if dsize:
            if pos + dsize > n:
                raise ValueError("zstd: truncated dictionary ID")
            dict_id = int.from_bytes(
                data[pos : pos + dsize], "little")
            pos += dsize
        fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        content_size = None
        if fcs_size:
            if pos + fcs_size > n:
                raise ValueError("zstd: truncated content size")
            content_size = int.from_bytes(
                data[pos : pos + fcs_size], "little")
            if fcs_size == 2:
                content_size += 256
            pos += fcs_size
        if single_segment and window_size is None:
            window_size = content_size
        n_blocks = 0
        while True:
            if pos + 3 > n:
                raise ValueError("zstd: truncated block header")
            head = (data[pos] | (data[pos + 1] << 8)
                    | (data[pos + 2] << 16))
            pos += 3
            last = head & 1
            btype = (head >> 1) & 0x3
            bsize = head >> 3
            if btype == 3:
                raise ValueError("zstd: reserved block type")
            length = 1 if btype == 1 else bsize  # RLE stores 1 byte
            if pos + length > n:
                raise ValueError("zstd: block exceeds data")
            pos += length
            n_blocks += 1
            if last:
                break
        if checksum:
            if pos + 4 > n:
                raise ValueError("zstd: truncated content checksum")
            pos += 4
        out.append({
            "kind": "frame", "offset": start,
            "compressed_bytes": pos - start,
            "content_size": content_size,
            "window_size": window_size, "has_checksum": checksum,
            "dict_id": dict_id, "n_blocks": n_blocks,
        })
    return out


def parse_lz4_frames(data: bytes) -> list[dict]:
    """Walk every LZ4 frame: ``[{offset, compressed_bytes,
    content_size, block_max, independent_blocks, has_checksum,
    dict_id, n_blocks}]``."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("lz4: truncated magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        if (magic & 0xFFFFFFF0) == ZSTD_SKIPPABLE_LO:
            if pos + 8 > n:
                raise ValueError("lz4: truncated skippable header")
            (size,) = struct.unpack_from("<I", data, pos + 4)
            if pos + 8 + size > n:
                raise ValueError("lz4: skippable frame exceeds data")
            pos += 8 + size
            continue
        if magic != LZ4_MAGIC:
            raise ValueError(f"lz4: bad magic at offset {pos}")
        start = pos
        pos += 4
        if pos + 2 > n:
            raise ValueError("lz4: truncated frame descriptor")
        flg = data[pos]
        bd = data[pos + 1]
        pos += 2
        if (flg >> 6) != 1:
            raise ValueError("lz4: unsupported frame version")
        independent = bool(flg & 0x20)
        block_checksum = bool(flg & 0x10)
        has_content_size = bool(flg & 0x08)
        content_checksum = bool(flg & 0x04)
        has_dict_id = bool(flg & 0x01)
        bmax_id = (bd >> 4) & 0x7
        if bmax_id < 4:
            raise ValueError("lz4: reserved block max size")
        block_max = 1 << (2 * bmax_id + 8)  # 4:64KB … 7:4MB
        content_size = None
        if has_content_size:
            if pos + 8 > n:
                raise ValueError("lz4: truncated content size")
            (content_size,) = struct.unpack_from("<Q", data, pos)
            pos += 8
        dict_id = None
        if has_dict_id:
            if pos + 4 > n:
                raise ValueError("lz4: truncated dictionary ID")
            (dict_id,) = struct.unpack_from("<I", data, pos)
            pos += 4
        pos += 1  # header checksum byte
        if pos > n:
            raise ValueError("lz4: truncated header checksum")
        n_blocks = 0
        while True:
            if pos + 4 > n:
                raise ValueError("lz4: truncated block size")
            (bsize,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if bsize == 0:  # EndMark
                break
            length = bsize & 0x7FFFFFFF
            if length > block_max:
                raise ValueError("lz4: block exceeds declared max")
            if pos + length > n:
                raise ValueError("lz4: block exceeds data")
            pos += length
            if block_checksum:
                if pos + 4 > n:
                    raise ValueError("lz4: truncated block checksum")
                pos += 4
            n_blocks += 1
        if content_checksum:
            if pos + 4 > n:
                raise ValueError("lz4: truncated content checksum")
            pos += 4
        out.append({
            "offset": start, "compressed_bytes": pos - start,
            "content_size": content_size, "block_max": block_max,
            "independent_blocks": independent,
            "has_checksum": content_checksum, "dict_id": dict_id,
            "n_blocks": n_blocks,
        })
    return out


# --- fixture encoders (framing-valid; payload bytes are opaque) ------------


def encode_zstd_stream(
    frames: list[dict],
) -> bytes:
    """Framing-valid zstd stream for fixtures: each spec ``{blocks:
    [bytes...], content_size, dict_id, checksum, skippable}`` emits
    RAW blocks (stored, not compressed — RFC 8878 block type 0), so
    real decoders can decode the result too."""
    out = bytearray()
    for spec in frames:
        if spec.get("skippable") is not None:
            body = spec["skippable"]
            out += struct.pack("<I", ZSTD_SKIPPABLE_LO | 0xE)
            out += struct.pack("<I", len(body)) + body
            continue
        blocks = spec.get("blocks", [b""])
        content_size = spec.get("content_size")
        dict_id = spec.get("dict_id")
        checksum = spec.get("checksum", False)
        out += struct.pack("<I", ZSTD_MAGIC)
        fhd = 0
        dsize = 0
        if dict_id is not None:
            fhd |= 0x2  # 2-byte dict id
            dsize = 2
        if checksum:
            fhd |= 0x4
        fcs_size = 0
        if content_size is not None:
            fhd |= 0x80  # fcs flag 2 → 4 bytes
            fcs_size = 4
        out.append(fhd)
        out.append(0x58)  # window descriptor: 8MB-ish
        if dsize:
            out += int(dict_id).to_bytes(2, "little")
        if fcs_size:
            out += int(content_size).to_bytes(4, "little")
        for i, b in enumerate(blocks):
            last = 1 if i == len(blocks) - 1 else 0
            head = (len(b) << 3) | (0 << 1) | last  # raw block
            out += bytes((head & 0xFF, (head >> 8) & 0xFF,
                          (head >> 16) & 0xFF))
            out += b
        if checksum:
            out += b"\x00\x00\x00\x00"  # not validated by this walk
    return bytes(out)


def encode_lz4_stream(frames: list[dict]) -> bytes:
    """Framing-valid LZ4 stream: uncompressed blocks (high bit set),
    64KB block max."""
    out = bytearray()
    for spec in frames:
        blocks = spec.get("blocks", [b""])
        content_size = spec.get("content_size")
        out += struct.pack("<I", LZ4_MAGIC)
        flg = 0x40 | 0x20  # version 1, independent
        if content_size is not None:
            flg |= 0x08
        out.append(flg)
        out.append(0x40)  # BD: 64KB max
        if content_size is not None:
            out += struct.pack("<Q", content_size)
        out.append(0x00)  # header checksum (not validated here)
        for b in blocks:
            out += struct.pack("<I", 0x80000000 | len(b))
            out += b
        out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


# --- Spark operator --------------------------------------------------------


def compressed_shard_profile(files):
    """Per-blob frame audit for .zst / .lz4 corpora shards,
    dispatched by magic: frames, blocks, declared content sizes,
    window/memory requirements, dictionary dependencies.  Map-side;
    payloads never decompressed."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("file_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("n_skippable", T.IntegerType(), True),
        T.StructField("n_blocks", T.IntegerType(), True),
        T.StructField("declared_content_bytes", T.LongType(), True),
        T.StructField("max_window_bytes", T.LongType(), True),
        T.StructField("needs_dictionary", T.BooleanType(), True),
    ])
    cols = [f.name for f in out_schema.fields]

    def batches(it):
        import pandas as pd

        from bigdata_invoice_stream_analysis_spark.operators.compression import (
            LZ4_MAGIC,
            ZSTD_MAGIC,
            ZSTD_SKIPPABLE_LO,
            parse_lz4_frames,
            parse_zstd_frames,
        )

        for pdf in it:
            out = {k: [] for k in cols}
            for fid, p in zip(pdf["file_id"], pdf["payload"]):
                raw = bytes(p)
                row = dict.fromkeys(cols)
                row["file_id"] = fid
                magic = int.from_bytes(raw[:4], "little") if len(
                    raw) >= 4 else 0
                try:
                    if magic == ZSTD_MAGIC or (
                            magic & 0xFFFFFFF0) == ZSTD_SKIPPABLE_LO:
                        row["format"] = "zstd"
                        frames = parse_zstd_frames(raw)
                    elif magic == LZ4_MAGIC:
                        row["format"] = "lz4"
                        frames = parse_lz4_frames(raw)
                    else:
                        raise ValueError("not a zstd/lz4 stream")
                except ValueError as exc:
                    row["format"] = row["format"] or "unknown"
                    row["ok"] = False
                    row["error"] = str(exc)[:120]
                else:
                    real = [f for f in frames
                            if f.get("kind", "frame") == "frame"]
                    skip = len(frames) - len(real)
                    sizes = [f["content_size"] for f in real]
                    windows = [f["window_size"] for f in real
                               if f.get("window_size")]
                    row.update(
                        ok=True,
                        n_frames=len(real),
                        n_skippable=skip,
                        n_blocks=sum(f["n_blocks"] for f in real),
                        declared_content_bytes=(
                            sum(s for s in sizes if s is not None)
                            if any(s is not None for s in sizes)
                            else None),
                        max_window_bytes=(max(windows)
                                          if windows else None),
                        needs_dictionary=any(
                            f["dict_id"] for f in real),
                    )
                for k in cols:
                    out[k].append(row[k])
            yield pd.DataFrame(out)

    return files.mapInPandas(batches, schema=out_schema)
