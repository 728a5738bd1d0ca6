"""PNG ancillary-chunk metadata audit: chunk walk + CRC, text chunk
decode (tEXt/zTXt/iTXt incl. compressed), XMP detection, the eXIf
TIFF reuse (one IFD walk, two containers), fixture roundtrips, the
Spark operator.

Spec anchors: W3C PNG (ISO 15948) §5.3 chunk layout, §11.3.4 text
chunks, eXIf extension.
"""

from __future__ import annotations

import struct
import sys
import zlib
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.exif import (
    encode_exif_jpeg,
)
from bigdata_invoice_stream_analysis_spark.operators.pngmeta import (
    encode_png_with_metadata,
    parse_png_metadata,
    png_metadata_profile,
)


def _tiff_from_exif_jpeg(**kw) -> bytes:
    """Bare TIFF payload sliced out of the JPEG fixture's APP1."""
    jpeg = encode_exif_jpeg(**kw)
    start = jpeg.find(b"Exif\x00\x00")
    assert start > 0
    (seglen,) = struct.unpack(">H", jpeg[start - 2 : start])
    return jpeg[start + 6 : start - 2 + seglen]


def test_text_chunks_all_three_forms():
    png = encode_png_with_metadata(
        texts={"Author": "someone", "Software": "tool 1.0"},
        ztxt={"Comment": "deflated words " * 10},
        itxt={"Title": "unicodé title"},
    )
    m = parse_png_metadata(png)
    assert m["texts"]["Author"] == "someone"
    assert m["texts"]["Comment"] == "deflated words " * 10
    assert m["texts"]["Title"] == "unicodé title"
    assert m["has_xmp"] is False
    assert (m["width"], m["height"]) == (4, 3)


def test_compressed_itxt_and_xmp_flag():
    xmp = "<x:xmpmeta>" + "gps-ish " * 50 + "</x:xmpmeta>"
    m = parse_png_metadata(
        encode_png_with_metadata(xmp=xmp, itxt_compressed=True)
    )
    assert m["has_xmp"] is True
    assert m["texts"]["XML:com.adobe.xmp"] == xmp


def test_exif_chunk_reuses_tiff_walk_gps_bit():
    tiff = _tiff_from_exif_jpeg(gps=True, byte_order="MM",
                                orientation=6)
    m = parse_png_metadata(encode_png_with_metadata(exif_tiff=tiff))
    assert m["has_exif"] is True
    assert m["has_gps"] is True
    assert m["exif"]["orientation"] == 6
    assert m["exif"]["byte_order"] == "MM"
    clean = _tiff_from_exif_jpeg(gps=False)
    m2 = parse_png_metadata(encode_png_with_metadata(exif_tiff=clean))
    assert m2["has_exif"] is True and m2["has_gps"] is False


def test_time_and_phys_presence():
    m = parse_png_metadata(
        encode_png_with_metadata(time_chunk=True, phys=True)
    )
    assert m["has_time"] is True and m["has_phys"] is True


def test_crc_mismatch_raises():
    png = bytearray(encode_png_with_metadata(texts={"A": "b"}))
    idx = bytes(png).find(b"tEXt")
    png[idx + 5] ^= 0xFF  # flip a body byte, CRC now wrong
    with pytest.raises(ValueError, match="CRC"):
        parse_png_metadata(bytes(png))


def test_decode_png_still_reads_pixels():
    """The metadata fixture is a VALID image: the pixel decoder in
    operators/multimodal must still decode it (one fixture, both
    passes)."""
    from bigdata_invoice_stream_analysis_spark.operators.multimodal import (
        decode_png,
    )

    png = encode_png_with_metadata(width=5, height=2,
                                   texts={"Note": "x"})
    img = decode_png(png)
    assert (img["width"], img["height"]) == (5, 2)
    assert img["pixels"] == bytes(
        (r * 5 + c) % 251 for r in range(2) for c in range(5)
    )


def test_not_a_png_raises():
    with pytest.raises(ValueError, match="PNG"):
        parse_png_metadata(b"\xff\xd8\xff\xd9")


def test_png_metadata_profile_operator(spark):
    tiff = _tiff_from_exif_jpeg(gps=True)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_png_with_metadata(
                texts={"Author": "a"}, xmp="<x/>",
            ))),
            (2, bytearray(encode_png_with_metadata(exif_tiff=tiff))),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in png_metadata_profile(df).collect()}
    assert rows[1]["has_xmp"] is True
    assert rows[1]["keywords"] == "Author,XML:com.adobe.xmp"
    assert rows[1]["has_gps"] is False
    assert rows[2]["has_gps"] is True and rows[2]["has_exif"] is True


def test_corrupt_ztxt_is_valueerror_not_zlib_error():
    """Module contract: corrupt compressed text chunks surface as
    ValueError (quarantine-able), never zlib.error."""
    import zlib as _zlib

    png = bytearray(encode_png_with_metadata(ztxt={"C": "payload"}))
    idx = bytes(png).find(b"zTXt")
    # corrupt the deflate bytes but keep the CRC consistent
    body_start = idx + 4
    chunk_len = struct.unpack(">I", png[idx - 4 : idx])[0]
    body = bytearray(png[body_start : body_start + chunk_len])
    body[-1] ^= 0xFF
    crc = _zlib.crc32(b"zTXt" + bytes(body))
    png[body_start : body_start + chunk_len] = body
    png[body_start + chunk_len : body_start + chunk_len + 4] = (
        struct.pack(">I", crc)
    )
    with pytest.raises(ValueError, match="compressed text"):
        parse_png_metadata(bytes(png))
