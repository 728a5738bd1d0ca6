"""ZIP archive walking + deflate extraction — document corpora and
dataset bundles (EPUB, DOCX/XLSX, plain .zip drops) at scan speed.

Document corpora arrive zipped twice over: the dataset bundle itself,
and the documents inside it (every EPUB/DOCX/XLSX IS a zip). This
walks the public PKWARE APPNOTE structures directly: the End Of
Central Directory record found by backward scan (comment-tolerant),
the central directory (the authoritative member list — local headers
can lie and streaming writers leave them incomplete), local header
resolution for payload offsets, and ZIP64 EOCD/extra-field handling
for >4 GiB archives. STORED members are sliced; DEFLATE members are
actually decompressed (zlib, raw window) with the CRC-32 verified —
this is a real decode path, not a stub, because the inflate machinery
ships in the Python stdlib.

Scale posture: Arrow mapInPandas, one archive per row; the central
directory read touches only the archive tail, so a members-only
triage never reads the payload bytes at all — the same
offsets-not-contents posture as the TAR/WebDataset walk
(operators/wds.py).

Reference: n/a (extension surface; staged for round-8 registration —
see plans/graded.py docstring).
"""

from __future__ import annotations

import struct
import zlib

_EOCD_SIG = b"PK\x05\x06"
_EOCD64_LOC_SIG = b"PK\x06\x07"
_EOCD64_SIG = b"PK\x06\x06"
_CDH_SIG = b"PK\x01\x02"
_LFH_SIG = b"PK\x03\x04"

STORED = 0
DEFLATED = 8


def _find_eocd(data: bytes) -> int:
    """Backward scan for the EOCD signature (the archive comment may
    be up to 64 KiB, so the record is not at a fixed offset). A
    candidate only counts if its comment-length field matches the
    bytes actually remaining — the stdlib's guard against the
    signature bytes appearing INSIDE a comment."""
    floor = max(0, len(data) - 22 - 65536)
    pos = len(data)
    while True:
        pos = data.rfind(_EOCD_SIG, floor, pos)
        if pos < 0:
            raise ValueError("not a ZIP archive (no EOCD record)")
        if pos + 22 <= len(data):
            (comment_len,) = struct.unpack(
                "<H", data[pos + 20 : pos + 22]
            )
            if pos + 22 + comment_len == len(data):
                return pos


def parse_zip(data: bytes) -> list[dict]:
    """Central-directory walk: one dict per member —
    ``{name, method, compressed_size, uncompressed_size, crc32,
    header_offset, is_dir}``. ZIP64 sizes/offsets resolved from the
    0x0001 extra field and the ZIP64 EOCD when the 32-bit fields
    saturate. The central directory is authoritative (APPNOTE 4.3.12)
    — local headers are not trusted for metadata."""
    data = bytes(data)
    eocd = _find_eocd(data)
    n_entries, cd_size, cd_off = struct.unpack(
        "<HII", data[eocd + 10 : eocd + 20]
    )
    if (
        n_entries == 0xFFFF or cd_off == 0xFFFFFFFF
        or cd_size == 0xFFFFFFFF
    ):
        loc = data.rfind(_EOCD64_LOC_SIG, 0, eocd)
        if loc < 0 or loc + 20 > len(data):
            raise ValueError("ZIP64 markers without a ZIP64 EOCD locator")
        (eocd64_off,) = struct.unpack("<Q", data[loc + 8 : loc + 16])
        if eocd64_off + 56 > len(data):
            raise ValueError("ZIP64 EOCD out of range")
        if data[eocd64_off : eocd64_off + 4] != _EOCD64_SIG:
            raise ValueError("bad ZIP64 EOCD signature")
        n_entries, = struct.unpack(
            "<Q", data[eocd64_off + 32 : eocd64_off + 40]
        )
        cd_size, cd_off = struct.unpack(
            "<QQ", data[eocd64_off + 40 : eocd64_off + 56]
        )
    members = []
    pos = cd_off
    for _ in range(n_entries):
        if pos + 46 > len(data):
            raise ValueError("central directory truncated")
        if data[pos : pos + 4] != _CDH_SIG:
            raise ValueError(f"bad central-directory signature at {pos}")
        (
            method, crc, csize, usize, name_len, extra_len, comment_len,
        ) = struct.unpack("<H4xIIIHHH", data[pos + 10 : pos + 34])
        (header_off,) = struct.unpack("<I", data[pos + 42 : pos + 46])
        name = data[pos + 46 : pos + 46 + name_len].decode(
            "utf-8", "replace"
        )
        extra = data[
            pos + 46 + name_len : pos + 46 + name_len + extra_len
        ]
        if 0xFFFFFFFF in (csize, usize, header_off):
            csize, usize, header_off = _zip64_extra(
                extra, csize, usize, header_off
            )
        members.append({
            "name": name,
            "method": method,
            "compressed_size": csize,
            "uncompressed_size": usize,
            "crc32": crc,
            "header_offset": header_off,
            "is_dir": name.endswith("/"),
        })
        pos += 46 + name_len + extra_len + comment_len
    return members


def _zip64_extra(
    extra: bytes, csize: int, usize: int, header_off: int
) -> tuple[int, int, int]:
    """The 0x0001 extra field carries 64-bit values for exactly the
    32-bit fields that saturated, in the fixed order usize, csize,
    offset (APPNOTE 4.5.3)."""
    pos = 0
    while pos + 4 <= len(extra):
        tag, size = struct.unpack("<HH", extra[pos : pos + 4])
        body = extra[pos + 4 : pos + 4 + size]
        if tag == 0x0001:
            fields = []
            for sat in (usize == 0xFFFFFFFF, csize == 0xFFFFFFFF,
                        header_off == 0xFFFFFFFF):
                if sat:
                    if len(body) < 8:
                        raise ValueError(
                            "ZIP64 extra shorter than its saturated fields"
                        )
                    fields.append(
                        struct.unpack("<Q", body[:8])[0]
                    )
                    body = body[8:]
                else:
                    fields.append(None)
            usize = fields[0] if fields[0] is not None else usize
            csize = fields[1] if fields[1] is not None else csize
            header_off = (
                fields[2] if fields[2] is not None else header_off
            )
            return csize, usize, header_off
        pos += 4 + size
    raise ValueError("saturated ZIP64 fields without a 0x0001 extra")


def read_zip_member(data: bytes, member: dict) -> bytes:
    """Slice + decode one member's payload: resolve the local header
    (its name/extra lengths position the data), then STORED-slice or
    raw-inflate, verifying CRC-32 against the central directory."""
    data = bytes(data)
    off = member["header_offset"]
    if data[off : off + 4] != _LFH_SIG:
        raise ValueError(f"bad local header at {off}")
    name_len, extra_len = struct.unpack("<HH", data[off + 26 : off + 30])
    start = off + 30 + name_len + extra_len
    raw = data[start : start + member["compressed_size"]]
    if len(raw) != member["compressed_size"]:
        raise ValueError("member payload overruns archive")
    if member["method"] == STORED:
        out = raw
    elif member["method"] == DEFLATED:
        try:
            out = zlib.decompress(raw, wbits=-15)
        except zlib.error as exc:
            # corrupt deflate must quarantine one member, not leak
            # zlib.error past the ValueError contract (r9 fuzz find)
            raise ValueError(
                f"bad deflate in {member['name']!r}: {exc}") from exc
    else:
        raise ValueError(f"unsupported compression method {member['method']}")
    if len(out) != member["uncompressed_size"]:
        raise ValueError("member size mismatch after decode")
    if zlib.crc32(out) != member["crc32"]:
        raise ValueError(f"CRC mismatch in {member['name']!r}")
    return out


def encode_zip(
    entries: list[tuple[str, bytes]], *, deflate: bool = True,
    comment: bytes = b"",
) -> bytes:
    """Deterministic ZIP fixture writer (timestamps pinned to 0):
    local headers + payloads, then the central directory and EOCD.
    Cross-validated against the stdlib zipfile reader in tests."""
    out = bytearray()
    central = bytearray()
    for name, body in entries:
        name_b = name.encode("utf-8")
        crc = zlib.crc32(body)
        if deflate and not name.endswith("/"):
            comp = zlib.compressobj(6, zlib.DEFLATED, -15)
            raw = comp.compress(body) + comp.flush()
            method = DEFLATED
        else:
            raw = body
            method = STORED
        off = len(out)
        header = struct.pack(
            "<4sHHHHHIIIHH", _LFH_SIG, 20, 0, method, 0, 0,
            crc, len(raw), len(body), len(name_b), 0,
        )
        out += header + name_b + raw
        central += struct.pack(
            "<4sHHHHHHIIIHHHHHII", _CDH_SIG, 20, 20, 0, method, 0, 0,
            crc, len(raw), len(body), len(name_b), 0, 0, 0, 0, 0, off,
        ) + name_b
    cd_off = len(out)
    out += central
    out += struct.pack(
        "<4sHHHHIIH", _EOCD_SIG, 0, 0, len(entries), len(entries),
        len(central), cd_off, len(comment),
    ) + comment
    return bytes(out)


def zip_members(archives):
    """Explode (archive_id, payload) ZIPs into one row per member
    from the central directory — names, methods, sizes, CRCs, offsets
    — WITHOUT touching payload bytes (the triage pass). Arrow
    mapInPandas."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("archive_id", T.LongType(), False),
        T.StructField("member_idx", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("method", T.IntegerType(), False),
        T.StructField("compressed_size", T.LongType(), False),
        T.StructField("uncompressed_size", T.LongType(), False),
        T.StructField("crc32", T.LongType(), False),
        T.StructField("is_dir", T.BooleanType(), False),
    ])
    cols = [f.name for f in out_schema.fields]

    def batches(it):
        import pandas as pd

        from bigdata_invoice_stream_analysis_spark.operators.zip import (
            parse_zip,
        )

        for pdf in it:
            out = {k: [] for k in cols}
            for aid, p in zip(pdf["archive_id"], pdf["payload"]):
                for i, m in enumerate(parse_zip(bytes(p))):
                    out["archive_id"].append(aid)
                    out["member_idx"].append(i)
                    for k in cols[2:]:
                        out[k].append(m[k])
            yield pd.DataFrame(out)

    return archives.mapInPandas(batches, schema=out_schema)


def zip_text_members(archives, *, suffixes: tuple[str, ...] = (".txt",
                                                               ".xml",
                                                               ".html",
                                                               ".json")):
    """Extract + decode the TEXT members of each archive (the
    EPUB/DOCX content files): one row per matching member with the
    inflated, CRC-verified payload decoded as UTF-8-with-replacement.
    Real decompression on the executors — the document-corpus path
    from zipped bundles straight into the text pipeline."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("archive_id", T.LongType(), False),
        T.StructField("member_idx", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_chars", T.IntegerType(), False),
    ])
    cols = [f.name for f in out_schema.fields]

    def batches(it):
        import pandas as pd

        from bigdata_invoice_stream_analysis_spark.operators.zip import (
            parse_zip,
            read_zip_member,
        )

        for pdf in it:
            out = {k: [] for k in cols}
            for aid, p in zip(pdf["archive_id"], pdf["payload"]):
                raw = bytes(p)
                for i, m in enumerate(parse_zip(raw)):
                    if m["is_dir"] or not m["name"].lower().endswith(
                        suffixes
                    ):
                        continue
                    text = read_zip_member(raw, m).decode(
                        "utf-8", "replace"
                    )
                    out["archive_id"].append(aid)
                    out["member_idx"].append(i)
                    out["name"].append(m["name"])
                    out["text"].append(text)
                    out["n_chars"].append(len(text))
            yield pd.DataFrame(out)

    return archives.mapInPandas(batches, schema=out_schema)
