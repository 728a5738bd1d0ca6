"""Iceberg metadata walk: snapshot resolution from table metadata,
manifest-list → manifest → entry explosion through the from-scratch
Avro reader, live-file filtering, partition pruning stats, and an
end-to-end mini-table whose data files come from our parquet
writer."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.iceberg import (
    STATUS_ADDED,
    STATUS_DELETED,
    STATUS_EXISTING,
    encode_manifest,
    encode_manifest_list,
    encode_table_metadata,
    live_files,
    manifest_entries,
    partition_stats,
    snapshot_info,
)

ENTRIES_M1 = [
    {"status": STATUS_ADDED, "snapshot_id": 10,
     "file_path": "data/a.parquet", "partition": {"day": "01"},
     "record_count": 5, "file_size_in_bytes": 100},
    {"status": STATUS_EXISTING, "snapshot_id": 9,
     "file_path": "data/b.parquet", "partition": {"day": "01"},
     "record_count": 7, "file_size_in_bytes": 140},
]
ENTRIES_M2 = [
    {"status": STATUS_DELETED, "snapshot_id": 10,
     "file_path": "data/c.parquet", "partition": {"day": "02"},
     "record_count": 3, "file_size_in_bytes": 60},
    {"status": STATUS_ADDED, "snapshot_id": 10,
     "file_path": "data/d.parquet", "partition": {"day": "02"},
     "record_count": 4, "file_size_in_bytes": 80},
]


def test_snapshot_info_resolution():
    meta = encode_table_metadata(
        snapshots=[
            {"snapshot_id": 9, "manifest_list": "snap-9.avro"},
            {"snapshot_id": 10, "manifest_list": "snap-10.avro",
             "operation": "overwrite"},
        ],
        current_snapshot_id=10,
    )
    info = snapshot_info(meta)
    assert info["current_snapshot_id"] == 10
    assert info["manifest_list"] == "snap-10.avro"
    assert info["operation"] == "overwrite"
    assert info["n_snapshots"] == 2
    assert info["format_version"] == 2
    with pytest.raises(ValueError, match="snapshot"):
        snapshot_info(json.dumps({"snapshots": []}))


def test_manifest_list_roundtrip_through_avro():
    from bigdata_invoice_stream_analysis_spark.operators.avro import (
        parse_avro,
    )

    blob = encode_manifest_list([
        {"manifest_path": "m1.avro", "added_files_count": 2},
        {"manifest_path": "m2.avro", "deleted_files_count": 1},
    ])
    recs = parse_avro(blob)["records"]
    assert [r["manifest_path"] for r in recs] == ["m1.avro", "m2.avro"]
    assert recs[0]["added_files_count"] == 2
    assert recs[1]["deleted_files_count"] == 1


def _manifests_df(spark):
    return spark.createDataFrame(
        [("m1.avro", bytearray(encode_manifest(ENTRIES_M1))),
         ("m2.avro", bytearray(encode_manifest(ENTRIES_M2))),
         ("bad.avro", bytearray(b"garbage"))],
        "manifest_path string, payload binary",
    )


def test_entry_explosion_and_live_set(spark):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )

    ensure_package_on_workers(spark)
    entries = manifest_entries(_manifests_df(spark))
    rows = entries.collect()
    quarantine = [r for r in rows if r["status"] == -1]
    assert len(quarantine) == 1
    assert quarantine[0]["manifest_path"] == "bad.avro"
    assert quarantine[0]["error"]

    live = {r["file_path"]: r for r in live_files(entries).collect()}
    assert set(live) == {"data/a.parquet", "data/b.parquet",
                         "data/d.parquet"}  # c deleted, bad dropped
    assert live["data/b.parquet"]["record_count"] == 7
    assert json.loads(live["data/d.parquet"]["partition_json"]) == {
        "day": "02"}

    stats = {r["partition_json"]: r
             for r in partition_stats(entries).collect()}
    assert stats[json.dumps({"day": "01"})]["n_rows"] == 12
    assert stats[json.dumps({"day": "02"})]["n_files"] == 1
    assert stats[json.dumps({"day": "02"})]["n_bytes"] == 80


def test_end_to_end_snapshot_scan(spark, tmp_path):
    """Metadata JSON → manifest list → manifests → live files →
    actually scan them and match the manifest's record counts —
    the full Iceberg read path with every byte produced by our own
    encoders."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.avro import (
        parse_avro,
    )
    from bigdata_invoice_stream_analysis_spark.operators.parquetmeta import (
        encode_parquet,
    )

    ensure_package_on_workers(spark)
    tdir = tmp_path / "table"
    (tdir / "data").mkdir(parents=True)
    (tdir / "metadata").mkdir()
    datasets = {"data/a.parquet": [1, 2, 3],
                "data/b.parquet": [4, 5],
                "data/dead.parquet": [9, 9, 9]}
    for rel, vals in datasets.items():
        (tdir / rel).write_bytes(encode_parquet([("v", "int64", vals)]))

    manifest = encode_manifest([
        {"status": STATUS_ADDED, "snapshot_id": 1,
         "file_path": "data/a.parquet", "record_count": 3},
        {"status": STATUS_ADDED, "snapshot_id": 1,
         "file_path": "data/b.parquet", "record_count": 2},
        {"status": STATUS_DELETED, "snapshot_id": 1,
         "file_path": "data/dead.parquet", "record_count": 3},
    ])
    (tdir / "metadata" / "m1.avro").write_bytes(manifest)
    mlist = encode_manifest_list([
        {"manifest_path": "metadata/m1.avro",
         "manifest_length": len(manifest)}])
    (tdir / "metadata" / "snap-1.avro").write_bytes(mlist)
    (tdir / "metadata" / "v1.metadata.json").write_text(
        encode_table_metadata(
            snapshots=[{"snapshot_id": 1,
                        "manifest_list": "metadata/snap-1.avro"}],
            current_snapshot_id=1))

    info = snapshot_info(
        (tdir / "metadata" / "v1.metadata.json").read_text())
    mlist_blob = (tdir / info["manifest_list"]).read_bytes()
    paths = [r["manifest_path"]
             for r in parse_avro(mlist_blob)["records"]]
    manifests = spark.createDataFrame(
        [(p, bytearray((tdir / p).read_bytes())) for p in paths],
        "manifest_path string, payload binary")
    live = {r["file_path"]: r["record_count"]
            for r in live_files(manifest_entries(manifests)).collect()}
    assert live == {"data/a.parquet": 3, "data/b.parquet": 2}
    for rel, claimed in live.items():
        assert spark.read.parquet(str(tdir / rel)).count() == claimed
