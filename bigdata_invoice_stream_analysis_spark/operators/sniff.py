"""Content sniffing + unified triage over heterogeneous blob corpora
— ONE pass that tells a 100 TB bucket of mixed scraped bytes what it
is holding.

Real corpora are not sorted by format: a blob column contains MP4s
next to WebMs, JPEGs next to WebPs and GIFs, MP3 next to ADTS, ZIP
shards next to TAR shards next to WARC archives. This module routes
each payload by magic bytes to the matching from-scratch parser built
across this repo and emits ONE uniform triage row per blob:

    (format, kind, width, height, duration_ms, codec, n_items,
     has_metadata_risk, detail)

``kind`` ∈ image/video/audio/archive/web/text-container;
``n_items`` is frames for video/animation, audio frames, archive
members, or WARC records; ``has_metadata_risk`` is the privacy bit
(EXIF GPS in JPEG, EXIF/XMP chunks in WebP). Unknown formats come
back as ``format='unknown'`` rather than an exception — at corpus
scale the triage row IS the signal that routes a blob to quarantine.

This is the dispatch layer a curation pipeline runs FIRST: filter on
the uniform columns, then hand each format's survivors to its
specialized operator (codec cross-checks, text extraction, sample
grouping) — which all already exist in this package.

Scale posture: Arrow mapInPandas, magic-byte dispatch costs a few
byte comparisons per blob; every parser reads only the structure it
needs (moov/central-directory/headers), never full payload decode.
"""

from __future__ import annotations


def sniff_format(data: bytes) -> str:
    """Magic-byte format identification for every format this repo
    parses. Returns the format token or 'unknown' — never raises."""
    if len(data) < 4:
        return "unknown"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if data[:2] in (b"P5", b"P6") and data[2:3] in b" \t\r\n":
        return "pnm"
    if data[:3] == b"GIF" and data[3:6] in (b"87a", b"89a"):
        return "gif"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return "avi"
    if data[4:8] == b"ftyp" and data[8:12] in (
        b"avif", b"avis", b"heic", b"heix", b"mif1", b"msf1"
    ):
        # HEIF-family brands are IMAGES in an ISO-BMFF shell — they
        # must route to the meta-box walker, not the movie demuxer.
        return "heif"
    if data[4:8] in (b"ftyp", b"moov"):
        return "mp4"
    if data[4:8] in (b"styp", b"moof"):
        # A DASH/CMAF MEDIA segment: valid, but its metadata lives in
        # the separate init segment — a distinct category, not an
        # error and not a full mp4.
        return "mp4_segment"
    if data[:4] == b"\x1a\x45\xdf\xa3":
        return "webm"
    if data[:9] == b"WARC/1.0\r" or data[:9] == b"WARC/1.1\r":
        return "warc"
    if data[:5] == b"%PDF-":
        return "pdf"
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if data[:2] == b"BM" and len(data) >= 18 and int.from_bytes(
        data[14:18], "little"
    ) in (12, 40, 52, 56, 64, 108, 124):
        # 'BM' alone is weak (text collides); requiring a known DIB
        # header size at offset 14 is the probe real sniffers use.
        return "bmp"
    if data[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00") and (
        len(data) >= 6 and 0 < int.from_bytes(data[4:6], "little") < 256
    ):
        return "ico"
    if data[:2] == b"\x1f\x8b":
        # gzip: a .warc.gz is the only gzip this repo claims; deeper
        # sniffing would need a decompress, which triage avoids.
        return "gzip"
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        return "zip"
    if len(data) >= 512 and data[257:262] == b"ustar":
        # covers POSIX (b"ustar\x00") AND GNU (b"ustar  \x00") magic —
        # default GNU tar output must not route to quarantine.
        return "tar"
    if (
        data[0] == 0x47
        and len(data) > 188
        and data[188] == 0x47
        and (len(data) <= 376 or data[376] == 0x47)
    ):
        # MPEG-TS: sync byte 0x47 repeating every 188 bytes. At least
        # TWO sync bytes required (three when the blob is long enough)
        # — a lone 188-byte blob starting with 'G' (e.g. a short text
        # snippet) must fall through to the text/unknown paths instead
        # of misrouting to the demuxer (ADVICE r8).
        return "ts"
    if data[:6] == b"WEBVTT" or data.lstrip(b"\xef\xbb\xbf")[:6] == b"WEBVTT":
        return "vtt"
    if data[:7] == b"#EXTM3U" or data.lstrip(b"\xef\xbb\xbf")[:7] == b"#EXTM3U":
        return "m3u8"
    head = data.lstrip(b"\xef\xbb\xbf \t\r\n")[:16]
    if (head.startswith((b"<?xml", b"<svg", b"<!DOCTYPE svg"))
            and b"<svg" in data[:1024]):
        # requiring the <svg root keeps generic XML (sitemaps, feeds)
        # out of the image path
        return "svg"
    if head.startswith((b"<?xml", b"<rss", b"<feed")) and (
        b"<rss" in data[:1024] or b"<feed" in data[:1024]
    ):
        return "feed"
    if head.startswith(b"From ") and b"\nFrom:" in data[:4096] or (
        head.startswith(b"From ") and b"\nSubject:" in data[:4096]
    ):
        # an mbox envelope line ("From " + sender + date — note the
        # SPACE) followed by real message headers
        return "mbox"
    if head.startswith((b"From:", b"Received:", b"Return-Path:",
                        b"Delivered-To:", b"Message-ID:",
                        b"MIME-Version:")):
        # an RFC 5322 message head: the characteristic first header
        # lines of .eml captures (a bare "Date:"/"Subject:" lead is
        # too ambiguous to claim)
        return "eml"
    if head.startswith(b"{"):
        # JSON-Lines: the dominant LLM interchange format. Sniff =
        # the first line parses as a JSON object (bounded: one line,
        # capped at 64 KiB).
        nl = data.find(b"\n")
        first = data[: nl if 0 <= nl <= 65536 else 65536]
        try:
            import json as _json

            if isinstance(_json.loads(first), dict):
                return "jsonl"
        except ValueError:
            pass
    if data[:4] == b"PAR1":
        return "parquet"
    if data[:3] == b"ORC" and len(data) >= 16:
        return "orc"
    if data[:6] == b"ARROW1":
        return "arrow"
    if data[:4] == b"Obj\x01":
        return "avro"
    if data[:6] == b"\x93NUMPY":
        return "npy"
    if data[:4] == b"\x28\xb5\x2f\xfd" or (
        (data[0] & 0xF0) == 0x50 and data[1:4] == b"\x2a\x4d\x18"
    ):
        return "zstd"
    if data[:4] == b"\x04\x22\x4d\x18":
        return "lz4"
    if data[:4] == b"OggS":
        return "ogg"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:2] == b"\x12\x00":
        # AV1 low-overhead bitstream: every stream opens with a
        # temporal-delimiter OBU (type 2, has_size=1, size 0) —
        # header byte 0x12 then leb128 0x00 (the same two-byte probe
        # AV1 demuxers use).
        return "av1"
    # Audio elementary streams: ID3v2 tag, then layer bits.
    audio = data
    if data[:3] == b"ID3":
        from bigdata_invoice_stream_analysis_spark.operators.mpegaudio import (
            parse_id3v2_size,
        )

        try:
            audio = data[parse_id3v2_size(data):]
        except ValueError:
            return "unknown"
    if len(audio) >= 2 and audio[0] == 0xFF:
        if (audio[1] & 0xF6) in (0xF2, 0xE2):
            return "mp3"
        if (audio[1] & 0xF6) == 0xF0:
            return "adts"
    return "unknown"


_SOF_MARKERS = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _jpeg_dims(data: bytes) -> tuple[int, int]:
    """Width/height from the SOFn segment (T.81 B.2.2: height u16 at
    body offset 1, width at 3) via the SAME marker walk parse_exif
    uses (operators/exif.iter_jpeg_segments) — one segment grammar,
    not two."""
    import struct

    from bigdata_invoice_stream_analysis_spark.operators.exif import (
        iter_jpeg_segments,
    )

    for marker, start, end in iter_jpeg_segments(data):
        if marker in _SOF_MARKERS:
            if end - start < 5:
                raise ValueError("truncated SOF segment")
            h, w = struct.unpack(">HH", data[start + 1 : start + 5])
            return w, h
    raise ValueError("JPEG has no SOF segment")


def triage(data: bytes) -> dict:
    """One uniform triage row for any payload. Parser failures after a
    positive sniff surface as format='<fmt>!error' with the message in
    ``detail`` — corrupt files are a category, not an exception."""
    row = {
        "format": "unknown", "kind": None, "width": None,
        "height": None, "duration_ms": None, "codec": None,
        "n_items": None, "has_metadata_risk": False, "detail": None,
    }
    fmt = sniff_format(data)
    row["format"] = fmt
    if fmt == "unknown":
        return row
    import struct
    import zlib

    try:
        _fill(row, fmt, data)
    except (
        ValueError, struct.error, zlib.error, ZeroDivisionError,
        IndexError, OverflowError, RecursionError,
    ) as exc:
        # RecursionError is defense in depth (ADVICE r8): parsers
        # bound their own nesting (avi/eml _MAX_DEPTH), but a missed
        # recursion path must still quarantine one blob, not kill the
        # task.
        # Parsers raise ValueError by contract, but adversarial bytes
        # can surface the lower-level types before a parser's own
        # validation runs — at corpus scale ALL of them mean the same
        # thing: quarantine the blob, keep the task alive.
        row["format"] = f"{fmt}!error"
        row["detail"] = str(exc)[:120] or type(exc).__name__
    return row


def _fill(row: dict, fmt: str, data: bytes) -> None:
    if fmt == "jpeg":
        from bigdata_invoice_stream_analysis_spark.operators.exif import (
            parse_exif,
        )

        exif = parse_exif(data)
        w, h = _jpeg_dims(data)
        row.update(
            kind="image", width=w, height=h, codec="jpeg", n_items=1,
            has_metadata_risk=exif["has_gps"],
        )
    elif fmt == "png":
        from bigdata_invoice_stream_analysis_spark.operators.multimodal import (
            decode_png,
        )

        img = decode_png(data)
        row.update(kind="image", width=img["width"],
                   height=img["height"], codec="png", n_items=1)
    elif fmt == "pnm":
        from bigdata_invoice_stream_analysis_spark.operators.multimodal import (
            decode_pnm,
        )

        img = decode_pnm(data)
        row.update(kind="image", width=img["width"],
                   height=img["height"], codec="pnm", n_items=1)
    elif fmt == "gif":
        from bigdata_invoice_stream_analysis_spark.operators.gif import (
            parse_gif,
        )

        g = parse_gif(data)
        row.update(
            kind="image", width=g["width"], height=g["height"],
            duration_ms=g["duration_ms"] if g["animated"] else None,
            codec="gif", n_items=g["n_frames"],
        )
    elif fmt == "webp":
        from bigdata_invoice_stream_analysis_spark.operators.webp import (
            parse_webp,
        )

        w = parse_webp(data)
        row.update(
            kind="image", width=w["width"], height=w["height"],
            duration_ms=w["duration_ms"] if w["animated"] else None,
            codec=f"webp-{w['variant']}", n_items=w["n_frames"],
            has_metadata_risk=w["has_exif"] or w["has_xmp"],
        )
    elif fmt == "wav":
        from bigdata_invoice_stream_analysis_spark.operators.multimodal import (
            decode_wav,
        )

        a = decode_wav(data)
        if a["sample_rate"] <= 0:
            raise ValueError("WAV declares a zero sample rate")
        row.update(
            kind="audio", codec="pcm",
            duration_ms=a["n_samples"] * 1000 // a["sample_rate"],
            n_items=a["n_samples"],
        )
    elif fmt == "avi":
        from bigdata_invoice_stream_analysis_spark.operators.avi import (
            parse_avi,
        )

        m = parse_avi(data)
        video = next((s for s in m["streams"]
                      if s["type"] == "vids"), None)
        row.update(
            kind="video", width=m["width"], height=m["height"],
            duration_ms=m["duration_ms"],
            codec=((video["compression"] or video["handler"])
                   if video else None),
            n_items=m["n_frames"],
            detail=None if (m["dims_match"] and m["frames_match"])
            else "header-mismatch",
        )
    elif fmt == "mp4":
        from bigdata_invoice_stream_analysis_spark.operators.mp4 import (
            parse_codec_profile,
            parse_mp4,
        )

        info = parse_mp4(data)
        if info["timescale"] <= 0:
            raise ValueError("mdhd declares a zero timescale")
        row.update(
            kind="video", n_items=info["n_samples"],
            duration_ms=info["duration"] * 1000 // info["timescale"],
        )
        try:
            prof = parse_codec_profile(data)
            row.update(width=prof["width"], height=prof["height"],
                       codec=prof["codec_string"])
        except ValueError:
            row["codec"] = "mp4/unindexed"  # raw-stsd fixtures etc.
    elif fmt == "heif":
        from bigdata_invoice_stream_analysis_spark.operators.heif import (
            parse_heif,
        )

        m = parse_heif(data)
        row.update(
            kind="image", width=m["width"], height=m["height"],
            codec=m["codec"], n_items=m["n_items"],
            has_metadata_risk=m["has_exif"] or m["has_xmp"],
            detail=None if m["dims_match"] else "header-mismatch",
        )
    elif fmt == "mp4_segment":
        # Valid DASH/CMAF media segment: codec metadata lives in the
        # init segment, so the row records the category and nothing
        # more — pairing with its init is the downstream join's job.
        row.update(kind="video", codec="mp4/segment")
    elif fmt == "webm":
        from bigdata_invoice_stream_analysis_spark.operators.ebml import (
            parse_webm,
        )

        info = parse_webm(data)
        video = next(
            (t for t in info["tracks"] if t["type"] == "video"), None,
        )
        audio = next(
            (t for t in info["tracks"] if t["type"] == "audio"), None,
        )
        # kind follows the TRACKS: .weba audio-only WebM is an audio
        # blob and must route to the audio pipeline, not the video one.
        lead = video or audio
        row.update(
            kind="video" if video else ("audio" if audio else "video"),
            duration_ms=info["duration_ms"],
            n_items=len(info["blocks"]),
            width=video["width"] if video else None,
            height=video["height"] if video else None,
            codec=lead["codec_id"] if lead else None,
        )
    elif fmt == "warc":
        from bigdata_invoice_stream_analysis_spark.operators.warc import (
            parse_warc,
        )

        recs = parse_warc(data)
        row.update(format="warc", kind="web", n_items=len(recs))
    elif fmt == "gzip":
        from bigdata_invoice_stream_analysis_spark.operators.warc import (
            parse_warc,
        )

        import struct
        import zlib

        try:
            recs = parse_warc(data)
        except (ValueError, struct.error, zlib.error, EOFError,
                OSError, IndexError, OverflowError):
            # A .tar.gz / .json.gz corpus blob is a VALID gzip that
            # simply isn't a WARC — quarantining it as 'gzip!error'
            # systematically misclassifies intact files (ADVICE r7).
            # The blob stays format='gzip', kind unknown; a pipeline
            # that cares decompresses and re-triages downstream.
            row.update(kind=None, detail="gzip but not a WARC")
        else:
            row.update(format="warc", kind="web", n_items=len(recs))
    elif fmt == "zip":
        from bigdata_invoice_stream_analysis_spark.operators.zip import (
            parse_zip,
        )

        members = parse_zip(data)
        names = {m["name"] for m in members}
        if "[Content_Types].xml" in names:
            # an OOXML package shipped as .zip bytes: route it to the
            # document pipeline, with the macro bit as the risk
            from bigdata_invoice_stream_analysis_spark.operators.ooxml import (  # noqa: E501
                parse_ooxml,
            )

            m = parse_ooxml(data)
            row.update(
                format="ooxml", kind="document",
                codec=m["kind"], n_items=m["n_units"],
                has_metadata_risk=bool(
                    m["has_macros"] or m["creator"]
                    or m["last_modified_by"]),
                detail="macros" if m["has_macros"] else None,
            )
        else:
            row.update(kind="archive", n_items=len(members))
    elif fmt == "tar":
        from bigdata_invoice_stream_analysis_spark.operators.wds import (
            parse_tar,
        )

        row.update(kind="archive", n_items=len(parse_tar(data)))
    elif fmt == "ts":
        from bigdata_invoice_stream_analysis_spark.operators.mpegts import (
            parse_ts,
        )

        m = parse_ts(data)
        v, a = m["video"], m["audio"]
        row.update(
            kind="video" if v else ("audio" if a else "data"),
            width=v["width"] if v else None,
            height=v["height"] if v else None,
            codec=(v["codec"] if v else (a["codec"] if a else None)),
            duration_ms=m["duration_ms"], n_items=m["n_packets"],
            detail=("scrambled" if m["scrambled"] else
                    (f"cc_errors={m['n_cc_errors']}"
                     if m["n_cc_errors"] else None)),
        )
    elif fmt == "vtt":
        from bigdata_invoice_stream_analysis_spark.operators.subtitles import (
            parse_vtt,
        )

        cues = parse_vtt(data.decode("utf-8", "replace"))
        row.update(
            kind="text", n_items=len(cues),
            duration_ms=max((c["end_ms"] for c in cues), default=0),
        )
    elif fmt == "m3u8":
        from bigdata_invoice_stream_analysis_spark.operators.hls import (
            parse_m3u8,
        )

        m = parse_m3u8(data.decode("utf-8", "replace"))
        full = [v for v in m["variants"] if not v["iframe_only"]]
        row.update(
            kind="text",
            n_items=(len(full) if m["kind"] == "master"
                     else len(m["segments"])),
            duration_ms=(m["total_duration_ms"]
                         if m["kind"] == "media" else None),
            detail=m["kind"] + (
                "+encrypted" if m["encrypted"] else ""),
        )
    elif fmt == "tiff":
        from bigdata_invoice_stream_analysis_spark.operators.exif import (
            parse_tiff,
        )

        prof = parse_tiff(data)
        row.update(
            kind="image", codec="tiff", n_items=1,
            width=prof["image_width"], height=prof["image_height"],
            has_metadata_risk=prof["has_gps"],
        )
    elif fmt == "feed":
        from bigdata_invoice_stream_analysis_spark.operators.feeds import (
            parse_feed,
        )

        m = parse_feed(data.decode("utf-8", "replace"))
        row.update(kind="web", codec=m["kind"],
                   n_items=m["n_entries"], detail=m["title"])
    elif fmt == "mbox":
        from bigdata_invoice_stream_analysis_spark.operators.eml import (
            split_mbox,
        )

        msgs = split_mbox(data.decode("utf-8", "replace"))
        row.update(kind="document", codec="mbox",
                   n_items=len(msgs), has_metadata_risk=True)
    elif fmt == "eml":
        from bigdata_invoice_stream_analysis_spark.operators.eml import (
            parse_eml,
        )

        m = parse_eml(data.decode("utf-8", "replace"))
        row.update(
            kind="document", codec="rfc5322",
            n_items=m["n_parts"],
            has_metadata_risk=m["has_addresses"],
            detail=(f"attachments={m['n_attachments']}"
                    if m["n_attachments"] else None),
        )
    elif fmt == "jsonl":
        import json as _json

        good = bad = 0
        for line in data.decode("utf-8", "replace").splitlines():
            if not line.strip():
                continue
            try:
                _json.loads(line)
                good += 1
            except ValueError:
                bad += 1
        row.update(kind="table", codec="jsonl", n_items=good,
                   detail=f"bad_lines={bad}" if bad else None)
    elif fmt == "svg":
        from bigdata_invoice_stream_analysis_spark.operators.svg import (
            parse_svg,
        )

        m = parse_svg(data.decode("utf-8", "replace"))
        w = m["width"] if m["width"] is not None else m["viewbox_width"]
        h = (m["height"] if m["height"] is not None
             else m["viewbox_height"])
        row.update(
            kind="image",
            width=int(w) if w is not None else None,
            height=int(h) if h is not None else None,
            codec="svg", n_items=m["n_elements"],
            has_metadata_risk=m["svg_risky"],
            detail="scripted" if m["svg_risky"] else None,
        )
    elif fmt == "bmp":
        from bigdata_invoice_stream_analysis_spark.operators.bmp import (
            parse_bmp,
        )

        m = parse_bmp(data)
        row.update(
            kind="image", width=m["width"], height=m["height"],
            codec=f"bmp-{m['compression']}", n_items=1,
            detail=None if m["size_consistent"] else "truncated-pixels",
        )
    elif fmt == "ico":
        from bigdata_invoice_stream_analysis_spark.operators.bmp import (
            parse_ico,
        )

        m = parse_ico(data)
        best = max(m["images"], key=lambda im: im["width"])
        row.update(
            kind="image", width=m["max_width"],
            height=m["max_height"],
            codec=f"ico-{best['payload_format']}",
            n_items=m["n_images"],
        )
    elif fmt == "pdf":
        from bigdata_invoice_stream_analysis_spark.operators.pdf import (
            parse_pdf,
        )

        info = parse_pdf(data)
        row.update(
            kind="document", n_items=info["n_pages"],
            detail="encrypted" if info["encrypted"] else None,
        )
    elif fmt == "parquet":
        from bigdata_invoice_stream_analysis_spark.operators.parquetmeta import (
            parse_parquet_footer,
        )

        meta = parse_parquet_footer(data)
        row.update(
            kind="table", codec="parquet",
            n_items=len(meta["row_groups"]),
            detail=(f"rows={meta['num_rows']};"
                    f"cols={meta['num_leaf_columns']}"),
        )
    elif fmt == "orc":
        from bigdata_invoice_stream_analysis_spark.operators.orcmeta import (
            parse_orc_footer,
        )

        meta = parse_orc_footer(data)
        row.update(
            kind="table", codec="orc",
            n_items=len(meta["stripes"]),
            detail=f"rows={meta['num_rows']}",
        )
    elif fmt == "arrow":
        from bigdata_invoice_stream_analysis_spark.operators.arrowipc import (
            parse_arrow_file,
        )

        meta = parse_arrow_file(data)
        row.update(
            kind="table", codec="arrow",
            n_items=meta["n_batches"],
            detail=f"rows={meta['num_rows']}",
        )
    elif fmt == "avro":
        from bigdata_invoice_stream_analysis_spark.operators.avro import (
            parse_avro,
        )

        meta = parse_avro(data, max_records=0)
        sch = meta["schema"]
        row.update(
            kind="table", codec=f"avro+{meta['codec']}",
            n_items=meta["n_records"],
            detail=(sch.get("name")
                    if isinstance(sch, dict) else None),
        )
    elif fmt == "npy":
        from bigdata_invoice_stream_analysis_spark.operators.tensorfile import (
            parse_npy,
        )

        meta = parse_npy(data)
        row.update(
            kind="tensor", codec=meta["dtype"],
            n_items=meta["n_elements"],
            detail="x".join(str(d) for d in meta["shape"]),
        )
    elif fmt in ("zstd", "lz4"):
        from bigdata_invoice_stream_analysis_spark.operators.compression import (
            parse_lz4_frames,
            parse_zstd_frames,
        )

        frames = (parse_zstd_frames(data) if fmt == "zstd"
                  else parse_lz4_frames(data))
        real = [f for f in frames
                if f.get("kind", "frame") == "frame"]
        declared = [f["content_size"] for f in real
                    if f["content_size"] is not None]
        row.update(
            kind="compressed", codec=fmt, n_items=len(real),
            detail=(f"declared={sum(declared)}"
                    if declared else None),
        )
    elif fmt == "ogg":
        from bigdata_invoice_stream_analysis_spark.operators.ogg import (
            parse_ogg,
        )

        meta = parse_ogg(data)
        # profile the primary (first-BOS) stream in the uniform row
        st = next(iter(meta["streams"].values()), None)
        row.update(
            kind="audio" if st and st["codec"] in (
                "opus", "vorbis", "flac") else "video",
            codec=st["codec"] if st else None,
            duration_ms=st["duration_ms"] if st else None,
            n_items=meta["n_pages"],
        )
    elif fmt == "flac":
        from bigdata_invoice_stream_analysis_spark.operators.flacmeta import (  # noqa: E501
            parse_flac,
        )

        m = parse_flac(data)
        row.update(
            kind="audio", codec="flac",
            duration_ms=m["duration_ms"],
            n_items=m["total_samples"],
            has_metadata_risk=m["has_picture"],
        )
    elif fmt == "av1":
        from bigdata_invoice_stream_analysis_spark.operators.av1 import (
            OBU_FRAME,
            OBU_FRAME_HEADER,
            OBU_SEQUENCE_HEADER,
            parse_obus,
            parse_sequence_header,
        )

        obus = parse_obus(data)
        seq = next(
            (o for o in obus if o["type"] == OBU_SEQUENCE_HEADER), None
        )
        if seq is None:
            raise ValueError("av1: no sequence header OBU")
        sh = parse_sequence_header(seq["payload"])
        row.update(
            kind="video", width=sh["max_width"],
            height=sh["max_height"],
            codec=f"av01.{sh['seq_profile']}."
                  f"{sh['seq_level_idx']:02d}"
                  f"{'H' if sh['seq_tier'] else 'M'}",
            n_items=sum(
                1 for o in obus
                if o["type"] in (OBU_FRAME, OBU_FRAME_HEADER)
            ),
        )
    elif fmt in ("mp3", "adts"):
        from bigdata_invoice_stream_analysis_spark.operators.mpegaudio import (
            parse_adts,
            parse_mp3,
        )

        a = parse_mp3(data) if fmt == "mp3" else parse_adts(data)
        risk = False
        if data[:3] == b"ID3":
            # the audio privacy bit: embedded pictures/objects and
            # PRIV tracker payloads in the leading ID3v2 tag (a
            # padding-only or absent tag carries no risk; a torn tag
            # already failed parse_mp3's skip above)
            from bigdata_invoice_stream_analysis_spark.operators.mpegaudio import (  # noqa: E501
                parse_id3v2_frames,
            )

            risk = any(
                f["kind"] in ("picture", "object", "private")
                for f in parse_id3v2_frames(data)["frames"]
            )
        row.update(
            kind="audio", codec=a["codec_string"],
            duration_ms=a["duration_ms"], n_items=a["n_frames"],
            has_metadata_risk=risk,
        )


def content_triage(media):
    """The dispatch operator: (media_id, payload) of ANY supported
    format → one uniform triage row, inside Arrow mapInPandas. The
    first pass over a heterogeneous blob corpus; survivors route to
    the per-format operators this package already provides."""
    from pyspark.sql import types as T

    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("format", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("codec", T.StringType(), True),
        T.StructField("n_items", T.LongType(), True),
        T.StructField("has_metadata_risk", T.BooleanType(), False),
        T.StructField("detail", T.StringType(), True),
    ])
    cols = [f.name for f in out_schema.fields]

    def batches(it):
        import pandas as pd

        from bigdata_invoice_stream_analysis_spark.operators.sniff import (
            triage,
        )

        for pdf in it:
            out = {k: [] for k in cols}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                row = triage(bytes(p))
                out["media_id"].append(mid)
                for k in cols[1:]:
                    out[k].append(row[k])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=out_schema)
