"""MPEG transport stream parsing (operators/mpegts) — ISO/IEC
13818-1 framing, PSI tables with real MPEG CRC-32, PES/PTS walk,
continuity accounting, and the shared-SPS geometry probe."""

import struct

import pytest

from bigdata_invoice_stream_analysis_spark.operators.mpegts import (
    PACKET_SIZE,
    encode_minimal_ts,
    encode_pat,
    encode_pes,
    encode_pmt,
    mpeg_crc32,
    packetize,
    parse_ts,
)


def test_mpeg_crc32_published_vector():
    # CRC-32/MPEG-2 check value from the public catalogue
    # (reveng: check=0x0376e6e7 for "123456789")
    assert mpeg_crc32(b"123456789") == 0x0376E6E7


def test_roundtrip_single_program():
    m = parse_ts(encode_minimal_ts())
    assert m["transport_stream_id"] == 7
    assert [p["program_number"] for p in m["programs"]] == [1]
    prog = m["programs"][0]
    assert prog["pcr_pid"] == 0x0101
    assert [(s["codec"], s["kind"]) for s in prog["streams"]] == [
        ("h264", "video"), ("aac-adts", "audio")]
    assert m["n_cc_errors"] == 0
    assert m["n_psi_crc_bad"] == 0
    assert not m["scrambled"]


def test_sps_geometry_via_shared_parser():
    # 40×23 macroblock units → 640×368, same arithmetic as the MP4
    # gate; crop units subtract in chroma-scaled pixels
    m = parse_ts(encode_minimal_ts())
    assert (m["video"]["width"], m["video"]["height"]) == (640, 368)
    m = parse_ts(encode_minimal_ts(
        width_mbs=120, height_map_units=68, crop_bottom_units=4))
    assert (m["video"]["width"], m["video"]["height"]) == (1920, 1080)


def test_pcr_duration_and_pts_fallback():
    m = parse_ts(encode_minimal_ts())
    # PCR span 2 × 900900 ticks at 27 MHz = 66 ms
    assert m["duration_ms"] == 66
    assert m["pcr_first"] == 27_000_000
    m = parse_ts(encode_minimal_ts(pcr0=None))
    # falls back to the widest PTS span: 2 × 3003 at 90 kHz
    assert m["duration_ms"] == 6006 * 1000 // 90000


def test_pts_values_recorded_per_pid():
    m = parse_ts(encode_minimal_ts())
    vid = m["pids"][0x0101]
    assert vid["first_pts"] == 90000
    assert vid["last_pts"] == 90000 + 2 * 3003
    assert vid["n_pes"] == 3


def test_continuity_gap_detected_once():
    m = parse_ts(encode_minimal_ts(cc_gap=True))
    assert m["n_cc_errors"] == 1
    assert m["pids"][0x0101]["cc_errors"] == 1


def test_legal_duplicate_packet_not_an_error():
    ts = bytearray(encode_minimal_ts())
    # duplicate one video payload packet verbatim (§2.4.3.3 allows
    # exactly one); splice it right after the original
    for off in range(0, len(ts), PACKET_SIZE):
        pid = ((ts[off + 1] & 0x1F) << 8) | ts[off + 2]
        if pid == 0x0101:
            dup = bytes(ts[off:off + PACKET_SIZE])
            ts = ts[:off + PACKET_SIZE] + dup + ts[off + PACKET_SIZE:]
            break
    m = parse_ts(bytes(ts))
    assert m["n_cc_errors"] == 0


def test_scrambled_video_flagged_not_probed():
    m = parse_ts(encode_minimal_ts(scramble_video=True))
    assert m["scrambled"]
    assert m["pids"][0x0101]["scrambled"]
    assert m["video"]["codec"] == "h264"  # PMT still declares it
    assert m["video"]["width"] is None    # ES walk impossible
    assert m["duration_ms"] == 66         # PCR is never scrambled


def test_bad_pmt_crc_is_data_not_fatal():
    m = parse_ts(encode_minimal_ts(bad_pmt_crc=True))
    assert m["n_psi_crc_bad"] == 1
    assert m["programs"] == []
    assert m["video"] is None


def test_hevc_stream_type_named_without_probe():
    m = parse_ts(encode_minimal_ts(video_stream_type=0x24))
    assert m["video"]["codec"] == "hevc"
    assert m["video"]["width"] is None


def test_unknown_stream_type_gets_hex_name():
    m = parse_ts(encode_minimal_ts(audio_stream_type=0xEA))
    types = {s["codec"] for s in m["programs"][0]["streams"]}
    assert "type-0xea" in types


def test_torn_tail_raises():
    with pytest.raises(ValueError, match="multiple"):
        parse_ts(encode_minimal_ts()[:-10])


def test_lost_sync_raises_with_offset():
    b = bytearray(encode_minimal_ts())
    b[PACKET_SIZE] = 0x00
    with pytest.raises(ValueError, match="lost sync at offset 188"):
        parse_ts(bytes(b))


def test_adaptation_overrun_raises():
    b = bytearray(encode_minimal_ts())
    # find a packet with an adaptation field and inflate its length
    for off in range(0, len(b), PACKET_SIZE):
        if (b[off + 3] >> 4) & 0x2:
            b[off + 4] = 200
            break
    with pytest.raises(ValueError, match="overruns"):
        parse_ts(bytes(b))


def test_tei_packet_counted_and_skipped():
    b = bytearray(encode_minimal_ts())
    b[PACKET_SIZE + 1] |= 0x80  # mark the PMT packet as errored
    m = parse_ts(bytes(b))
    assert m["n_tei"] == 1
    assert m["programs"] == []  # its section never arrived


def test_null_pid_ignored_for_continuity():
    ts = encode_minimal_ts()
    null_pkt = bytes([0x47, 0x1F, 0xFF, 0x10]) + b"\xff" * 184
    m = parse_ts(ts + null_pkt + null_pkt)
    assert m["n_cc_errors"] == 0
    assert m["pids"][0x1FFF]["n_packets"] == 2


def test_multi_program_pat():
    pat = encode_pat({1: 0x100, 2: 0x200}, tsid=9)
    pmt1 = encode_pmt(1, 0x101, [(0x1B, 0x101)])
    pmt2 = encode_pmt(2, 0x201, [(0x0F, 0x201)])
    ts = (packetize(0, pat, psi=True)
          + packetize(0x100, pmt1, psi=True)
          + packetize(0x200, pmt2, psi=True))
    m = parse_ts(ts)
    assert [p["program_number"] for p in m["programs"]] == [1, 2]
    assert m["transport_stream_id"] == 9
    assert m["video"]["pid"] == 0x101
    assert m["audio"]["pid"] == 0x201


def test_long_pes_spans_packets_with_stuffing():
    # a PES long enough to need several packets, ending mid-packet:
    # the final packet must stuff via the adaptation field and every
    # emitted packet must stay 188-byte aligned
    pes = encode_pes(0xE0, bytes(range(256)) * 3, pts=1234)
    pkts = packetize(0x50, pes, cc_start=5)
    assert len(pkts) % PACKET_SIZE == 0
    # reassemble: PUSI on the first packet only
    n = len(pkts) // PACKET_SIZE
    assert pkts[1] & 0x40
    for i in range(1, n):
        assert not (pkts[i * PACKET_SIZE + 1] & 0x40)


def test_unbounded_pes_length_for_long_video():
    pes = encode_pes(0xE0, bytes(70000), pts=0)
    assert struct.unpack(">H", pes[4:6])[0] == 0  # unbounded, legal
    ts = (packetize(0, encode_pat({1: 0x100}), psi=True)
          + packetize(0x100, encode_pmt(1, 0x101, [(0x1B, 0x101)]),
                      psi=True)
          + packetize(0x101, pes))
    m = parse_ts(ts)
    assert m["pids"][0x101]["n_pes"] == 1
    assert m["n_cc_errors"] == 0


def test_profile_operator(spark, sf_dir):
    from pyspark.sql import functions as F

    from bigdata_invoice_stream_analysis_spark.operators.mpegts import (
        ts_stream_profile,
    )

    payloads = [
        encode_minimal_ts(),
        encode_minimal_ts(cc_gap=True),
        encode_minimal_ts(scramble_video=True),
        b"not a transport stream" + bytes(188),
    ]
    files = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "file_id long, payload binary",
    )
    rows = {r["file_id"]: r
            for r in ts_stream_profile(files).collect()}
    assert rows[0]["ok"] and rows[0]["width"] == 640
    assert rows[1]["n_cc_errors"] == 1
    assert rows[2]["scrambled"] and rows[2]["width"] is None
    assert not rows[3]["ok"] and rows[3]["error"]
    plan = ts_stream_profile(files)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side: zero shuffles


def test_psi_section_spanning_packets():
    # a PMT with enough streams that its section exceeds one packet:
    # the reassembly path (pointer_field, continuation packets) must
    # produce the same table as the single-packet path
    streams = [(0x1B, 0x100 + i) for i in range(50)]
    pmt = encode_pmt(1, 0x100, streams)
    assert len(pmt) > 184  # really spans packets
    ts = (packetize(0, encode_pat({1: 0x80}), psi=True)
          + packetize(0x80, pmt, psi=True))
    m = parse_ts(ts)
    assert len(m["programs"][0]["streams"]) == 50
    assert m["n_psi_crc_bad"] == 0
    assert m["pids"][0x80]["n_packets"] >= 2


def test_two_sections_in_one_packet():
    # two PATs back-to-back in one payload: the drain loop must
    # parse BOTH (the version-bump pattern live muxers emit), then
    # the PMT on the pid only the second PAT announced must resolve
    pat1 = encode_pat({1: 0x100}, tsid=5, version=0)
    pat2 = encode_pat({1: 0x100, 2: 0x200}, tsid=5, version=1)
    ts = (packetize(0, pat1 + pat2, psi=True)
          + packetize(0x200, encode_pmt(2, 0x201, [(0x0F, 0x201)]),
                      psi=True))
    m = parse_ts(ts)
    assert m["transport_stream_id"] == 5
    assert m["n_psi_crc_bad"] == 0
    assert [p["program_number"] for p in m["programs"]] == [2]
    assert m["audio"]["pid"] == 0x201
