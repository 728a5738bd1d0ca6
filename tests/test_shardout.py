"""Shard export round trips: WebDataset tars and TFRecord shards
written distributed, re-read with this repo's own parsers and the
stdlib, manifests checked, determinism across partitionings."""

from __future__ import annotations

import sys
import tarfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.shardout import (
    write_tfrecord_shards,
    write_webdataset_shards,
)


def _components(spark):
    rows = []
    for i in range(12):
        key = f"sample{i:04d}"
        rows.append((i % 3, key, "txt", bytearray(
            f"text body {i}".encode())))
        rows.append((i % 3, key, "json", bytearray(
            ('{"i": %d}' % i).encode())))
    return spark.createDataFrame(
        rows, "shard int, key string, ext string, payload binary")


def test_webdataset_roundtrip(spark, tmp_path):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.wds import (
        parse_tar,
    )

    def read_tar_member(blob, m):
        return blob[m["offset"]:m["offset"] + m["size"]]

    ensure_package_on_workers(spark)
    out = str(tmp_path / "wds")
    manifest = {r["shard"]: r for r in write_webdataset_shards(
        _components(spark), out).collect()}
    assert set(manifest) == {0, 1, 2}
    for shard, row in manifest.items():
        assert row["n_samples"] == 4
        assert row["n_files"] == 8
        blob = Path(row["path"]).read_bytes()
        assert len(blob) == row["n_bytes"]
        members = parse_tar(blob)
        names = [m["name"] for m in members]
        assert names == sorted(names)  # deterministic order
        # our parser and the stdlib agree on content
        with tarfile.open(row["path"]) as tf:
            for m in members:
                std = tf.extractfile(m["name"]).read()
                assert read_tar_member(blob, m) == std
        # the text bodies round trip
        body = read_tar_member(blob, members[1])
        assert body.startswith(b"text body ")


def test_webdataset_deterministic_across_partitionings(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    write_webdataset_shards(
        _components(spark).repartition(1), a).collect()
    write_webdataset_shards(
        _components(spark).repartition(7), b).collect()
    for shard in range(3):
        fa = Path(a) / f"shard-{shard:06d}.tar"
        fb = Path(b) / f"shard-{shard:06d}.tar"
        assert fa.read_bytes() == fb.read_bytes()


def test_tfrecord_roundtrip(spark, tmp_path):
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.tfrecord import (
        encode_example,
        parse_example,
        parse_tfrecords,
    )

    ensure_package_on_workers(spark)
    rows = [
        (i % 2, f"k{i:03d}", bytearray(encode_example(
            {"text": [f"doc {i}".encode()], "label": [i]})))
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "shard int, key string, example binary")
    out = str(tmp_path / "tfr")
    manifest = {r["shard"]: r for r in write_tfrecord_shards(
        df, out).collect()}
    assert set(manifest) == {0, 1}
    total = 0
    for shard, row in manifest.items():
        blob = Path(row["path"]).read_bytes()
        recs = parse_tfrecords(blob)
        assert len(recs) == row["n_records"] == 5
        assert all(r["data_crc_ok"] for r in recs)
        labels = [parse_example(r["payload"])["label"]["values"][0]
                  for r in recs]
        assert labels == sorted(labels)  # key-sorted order
        total += len(recs)
    assert total == 10
