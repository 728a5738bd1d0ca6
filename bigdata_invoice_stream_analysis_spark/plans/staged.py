"""Round-9 staging area: graded-row candidates for the late-r8
operator surface, built to the exact house pattern (bounded
deterministic codebooks keyed by ``doc_id % K``; closed-form DuckDB
oracles computed from fixture PARAMETERS or an independent reference
implementation — never by running the parser under test) but NOT
registered: the r8 window is full, and the registry-closing
invariant says new registrations enter WITH a window slot.

``STAGED_QUERIES`` / ``STAGED_ORACLES`` mirror the live registry's
shape; ``tests/test_staged_parity.py`` runs the driver's own
compare over them at sf0.001, so round 9's registration is a
mechanical move: add ``@query`` (or re-export into plans/queries)
and a ``GRADED_50`` slot.

Where a candidate can gate on REAL table data instead of a codebook
(the VARIANT shred over orders, the drift histogram over events),
it does — those oracles recompute from the same tables and stay
scale-covariant at any sf.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_invoice_stream_analysis_spark.sources.tables import load_table

STAGED_QUERIES: dict = {}
STAGED_ORACLES: dict[str, str] = {}


def staged(name: str, oracle: str):
    def deco(fn):
        STAGED_QUERIES[name] = fn
        STAGED_ORACLES[name] = oracle
        return fn
    return deco


# ---------------------------------------------------------------------------
# variant_order_shred — REAL-data gate: orders → JSON → VARIANT → typed
# ---------------------------------------------------------------------------

_VARIANT_ORACLE = """
SELECT o_orderkey AS order_id,
       CAST(FALSE AS BOOLEAN) AS _corrupt,
       o_custkey AS cust_id,
       o_orderstatus AS status,
       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents
FROM orders
"""


@staged("variant_order_shred", _VARIANT_ORACLE)
def q_variant_order_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT round trip on REAL data: orders rows rendered to JSON
    strings (to_json), re-parsed with try_parse_json, and shredded
    back to typed columns with try_variant_get — the parse-once
    semi-structured path gated against the table the JSON came from.
    Money crosses as integer cents so the gate is FP-deterministic.
    Pure Column algebra; one scan, zero shuffles, zero Python."""
    from bigdata_invoice_stream_analysis_spark.functions.variantjson import (
        shred_json,
    )

    o = load_table(spark, sf_dir, "orders")
    payload = o.select(
        F.col("o_orderkey").alias("order_id"),
        F.to_json(F.struct(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderstatus").alias("status"),
            # ROUND before the cast on BOTH sides: the double
            # product is bit-identical across engines, but
            # cast-to-int truncates in Spark and rounds in DuckDB
            F.round(F.col("o_totalprice") * 100).cast("long")
            .alias("total_cents"),
        )).alias("body"),
    )
    return shred_json(
        payload, "body",
        [("$.cust", "bigint"), ("$.status", "string"),
         ("$.total_cents", "bigint")],
        keep=["order_id"],
    ).select(
        "order_id", "_corrupt",
        F.col("cust").alias("cust_id"), "status", "total_cents",
    )


# ---------------------------------------------------------------------------
# variant_schema_drift — REAL-data drift histogram over events
# ---------------------------------------------------------------------------

_DRIFT_ORACLE = """
WITH shapes AS (
  SELECT CASE WHEN event_id % 3 = 0 THEN 'BIGINT'
              WHEN event_id % 3 = 1 THEN 'STRING'
              ELSE 'missing' END AS value_schema
  FROM events
)
SELECT '$.uid' AS path, value_schema, COUNT(*) AS n
FROM shapes
GROUP BY value_schema
"""


@staged("variant_schema_drift", _DRIFT_ORACLE)
def q_variant_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit on REAL data: events rendered as JSON whose
    ``uid`` field drifts by construction (int / string / absent by
    event_id % 3), then json_schema_drift must report exactly the
    constructed type histogram — recomputable by the oracle straight
    from the table.  Scale-covariant at any sf."""
    from bigdata_invoice_stream_analysis_spark.functions.variantjson import (
        json_schema_drift,
    )

    e = load_table(spark, sf_dir, "events")
    body = F.when(
        F.col("event_id") % 3 == 0,
        F.to_json(F.struct(F.col("user_id").alias("uid"))),
    ).when(
        F.col("event_id") % 3 == 1,
        F.to_json(F.struct(
            F.col("user_id").cast("string").alias("uid"))),
    ).otherwise(F.lit('{"other": 1}'))
    return json_schema_drift(
        e.select(body.alias("body")), "body", ["$.uid"])


# ---------------------------------------------------------------------------
# parquet_chunk_audit — footer audit over a writer-fixture codebook
# ---------------------------------------------------------------------------

_PQ_K = 6


def _pq_columns(k: int) -> list[tuple[str, str, list]]:
    n = 4 + (k % 3)
    ids: list = [i * (k + 1) for i in range(n)]
    if k % 2 == 1:
        ids = [None if i == 1 else v for i, v in enumerate(ids)]
    names = [f"n{k}_{i}" for i in range(n)]
    return [("id", "int64", ids), ("name", "string", names)]


def _pq_payload(k: int) -> bytes:
    from bigdata_invoice_stream_analysis_spark.operators.parquetmeta import (
        encode_parquet,
    )

    return encode_parquet(
        _pq_columns(k),
        codec="GZIP" if k % 2 == 0 else "UNCOMPRESSED",
        max_rows_per_group=3,
    )


def _pq_oracle() -> str:
    rows = []
    for k in range(_PQ_K):
        cols = _pq_columns(k)
        n = len(cols[0][2])
        codec = "GZIP" if k % 2 == 0 else "UNCOMPRESSED"
        for g, start in enumerate(range(0, n, 3)):
            for name, typ, vals in cols:
                sl = vals[start:start + 3]
                present = [v for v in sl if v is not None]
                vmin = (str(min(present)) if typ == "int64"
                        else min(present)) if present else None
                vmax = (str(max(present)) if typ == "int64"
                        else max(present)) if present else None
                q = lambda v: "NULL" if v is None else f"'{v}'"
                rows.append(
                    f"({k}, {g}, '{name}', "
                    f"'{'INT64' if typ == 'int64' else 'BYTE_ARRAY'}', "
                    f"'{codec}', {len(sl)}, "
                    f"{len(sl) - len(present)}, {q(vmin)}, {q(vmax)})"
                )
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS file_id, CAST(doc_id % {_PQ_K} AS INT) AS k
  FROM documents
),
cb(k, row_group, column_path, physical_type, codec, num_values,
   null_count, stat_min, stat_max) AS (VALUES {values})
SELECT file_id, CAST(row_group AS INT) AS row_group, column_path,
       physical_type, codec, CAST(num_values AS BIGINT) AS num_values,
       CAST(null_count AS BIGINT) AS null_count, stat_min, stat_max
FROM media JOIN cb USING (k)
"""


@staged("parquet_chunk_audit", _pq_oracle())
def q_parquet_chunk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET FOOTER AUDIT — the lakehouse control-plane read: every
    doc maps to a parquet file from a 6-variant codebook written by
    our own from-scratch writer (GZIP and UNCOMPRESSED, multi-row-
    group, optional columns); executors parse the Thrift compact
    footer (operators/parquetmeta) and emit one row per column chunk
    with decoded min/max/null statistics.  The oracle recomputes
    every chunk's stats in closed form from the fixture value lists —
    a drift anywhere in the varint/zigzag/field-header walk flips the
    hash.  Plan: bounded broadcast + map-side tail reads, 0 data
    shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.parquetmeta import (
        parquet_column_chunks,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_pq_payload(k))) for k in range(_PQ_K)],
        "k int, payload binary",
    )
    files = d.select(
        F.col("doc_id").alias("file_id"),
        (F.col("doc_id") % _PQ_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return parquet_column_chunks(
        files.select("file_id", "payload")
    ).select("file_id", "row_group", "column_path", "physical_type",
             "codec", "num_values", "null_count", "stat_min",
             "stat_max")


# ---------------------------------------------------------------------------
# delta_snapshot_audit — log-replay gate over k-scoped fixture logs
# ---------------------------------------------------------------------------

_DELTA_K = 5


def _delta_commits(k: int) -> list[list[dict]]:
    base = [
        [{"add": f"k{k}/p0.parquet", "size": 100 + k, "rows": 10 + k},
         {"add": f"k{k}/p1.parquet", "size": 200, "rows": 20}],
        [{"remove": f"k{k}/p0.parquet"},
         {"add": f"k{k}/p2.parquet", "size": 300, "rows": 30}],
    ]
    if k % 2 == 0:  # re-add pattern
        base.append([{"add": f"k{k}/p0.parquet", "size": 150,
                      "rows": 15}])
    if k % 3 == 0:  # same-commit remove+add (OPTIMIZE shape)
        base.append([{"remove": f"k{k}/p1.parquet"},
                     {"add": f"k{k}/p1.parquet", "size": 210,
                      "rows": 20}])
    return base


def _delta_replay(k: int) -> list[tuple[str, int, int, int]]:
    live: dict[str, tuple[int, int, int]] = {}
    for v, specs in enumerate(_delta_commits(k)):
        removed = set()
        for s in specs:
            if "remove" in s:
                removed.add(s["remove"])
            if "add" in s:
                live[s["add"]] = (v, s["size"], s["rows"])
        for p in removed:
            if p in live and live[p][0] == v:
                continue
            live.pop(p, None)
    return sorted(
        (p, sz, rows, v) for p, (v, sz, rows) in live.items())


def _delta_oracle() -> str:
    rows = []
    for k in range(_DELTA_K):
        for p, sz, nrec, v in _delta_replay(k):
            rows.append(f"({k}, '{p}', {sz}, {nrec}, {v})")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS table_id, CAST(doc_id % {_DELTA_K} AS INT) AS k
  FROM documents
),
cb(k, path, size, num_records, version) AS (VALUES {values})
SELECT table_id, path, CAST(size AS BIGINT) AS size,
       CAST(num_records AS BIGINT) AS num_records,
       CAST(version AS BIGINT) AS version
FROM media JOIN cb USING (k)
"""


@staged("delta_snapshot_audit", _delta_oracle())
def q_delta_snapshot_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA LOG REPLAY — pure-Catalyst snapshot computation gated
    against an independent Python replay: 5 commit-log variants
    (plain appends, remove+compact, re-add-after-remove, same-commit
    remove+add OPTIMIZE shape) with k-scoped paths replay in ONE
    global window pass; every doc then joins its variant's live set.
    The oracle pins path/size/rows/version literals from the replay
    model.  Plan: one metadata-scale path window + one broadcast
    join; zero Python."""
    from bigdata_invoice_stream_analysis_spark.operators.deltalog import (
        delta_actions,
        delta_snapshot,
        encode_delta_log,
    )

    lines = [
        (v, line)
        for k in range(_DELTA_K)
        for v, body in encode_delta_log(_delta_commits(k))
        for line in body.split("\n")
    ]
    log = spark.createDataFrame(lines, "version long, line string")
    snap = delta_snapshot(delta_actions(log)).select(
        "path", "size", "num_records", "version",
        F.regexp_extract("path", r"^k(\d+)/", 1).cast("int").alias("k"),
    )
    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("table_id"),
        (F.col("doc_id") % _DELTA_K).cast("int").alias("k"),
    )
    return d.join(F.broadcast(snap), "k").select(
        "table_id", "path", "size", "num_records", "version")


# ---------------------------------------------------------------------------
# tfrecord_feature_audit — framing + Example decode over shard codebook
# ---------------------------------------------------------------------------

_TF_K = 5


def _tf_specs(k: int) -> list[dict]:
    recs = [
        {"img": [bytes((k + j) % 256 for j in range(32 + k))],
         "label": [k, k + 1, -k]},
        {"score": [0.5 * (k + 1), -1.5], "ids": [10 * k]},
    ]
    if k % 2 == 1:
        recs.append({"txt": [f"doc{k}".encode(), b"x" * k]})
    return recs


def _tf_payload(k: int) -> bytes:
    from bigdata_invoice_stream_analysis_spark.operators.tfrecord import (
        encode_example,
        encode_tfrecords,
    )

    blob = encode_tfrecords(
        [encode_example(spec) for spec in _tf_specs(k)])
    if k == 4:  # planted corruption: flip the first payload byte
        b = bytearray(blob)
        b[12] ^= 0xFF
        blob = bytes(b)
    return blob


def _tf_oracle() -> str:
    rows = []
    for k in range(_TF_K):
        if k == 4:
            # record 0 quarantines; later records keep valid CRCs
            rows.append(
                f"({k}, 0, FALSE, '!undecodable', 'error', 0, "
                "NULL, NULL, NULL, NULL)")
            specs = _tf_specs(k)[1:]
            base = 1
        else:
            specs = _tf_specs(k)
            base = 0
        for ri, spec in enumerate(specs, start=base):
            for name in sorted(spec):
                vals = spec[name]
                if isinstance(vals[0], (bytes, str)):
                    kind, fb = "bytes", len(vals[0])
                    int_sum = vmin = vmax = None
                elif isinstance(vals[0], float):
                    kind, fb, int_sum = "float", None, None
                    vmin, vmax = min(vals), max(vals)
                else:
                    kind, fb = "int64", None
                    int_sum, vmin, vmax = sum(vals), None, None
                q = lambda v: "NULL" if v is None else str(v)
                rows.append(
                    f"({k}, {ri}, TRUE, '{name}', '{kind}', "
                    f"{len(vals)}, {q(fb)}, {q(int_sum)}, "
                    f"{q(vmin)}, {q(vmax)})")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS blob_id, CAST(doc_id % {_TF_K} AS INT) AS k
  FROM documents
),
cb(k, record_idx, crc_ok, feature, kind, n_values, first_bytes_len,
   int_sum, float_min, float_max) AS (VALUES {values})
SELECT CAST(blob_id AS VARCHAR) || '#' || CAST(record_idx AS VARCHAR)
         || '#' || feature AS audit_key,
       blob_id, CAST(record_idx AS INT) AS record_idx, crc_ok,
       feature, kind, CAST(n_values AS INT) AS n_values,
       CAST(first_bytes_len AS INT) AS first_bytes_len,
       CAST(int_sum AS BIGINT) AS int_sum,
       CAST(float_min AS DOUBLE) AS float_min,
       CAST(float_max AS DOUBLE) AS float_max
FROM media JOIN cb USING (k)
"""


@staged("tfrecord_feature_audit", _tf_oracle())
def q_tfrecord_feature_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRECORD SHARD AUDIT — CRC-32C framing + protobuf Example
    decode: 5 shard variants (bytes/int64/float/string features, a
    variant with a PLANTED corrupt first record whose CRC must flag
    and whose payload must quarantine as an !undecodable row while
    the rest of the shard survives).  The oracle recomputes feature
    kinds, counts, byte lengths, int sums and float ranges from the
    fixture SPECS.  audit_key leads the projection per the non-null
    sort-prefix convention (PERF §40).  Map-side; 0 data shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.tfrecord import (
        tfrecord_features,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_tf_payload(k))) for k in range(_TF_K)],
        "k int, payload binary",
    )
    shards = d.select(
        F.col("doc_id").alias("shard_id"),
        (F.col("doc_id") % _TF_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    feats = tfrecord_features(shards.select("shard_id", "payload"))
    return feats.select(
        F.concat_ws(
            "#", F.col("shard_id"), F.col("record_idx"),
            F.col("feature")).alias("audit_key"),
        F.col("shard_id").alias("blob_id"),
        "record_idx", "crc_ok", "feature", "kind", "n_values",
        "first_bytes_len", "int_sum", "float_min", "float_max",
    )


# ---------------------------------------------------------------------------
# avro_container_audit — schema-driven decode across all stdlib codecs
# ---------------------------------------------------------------------------

_AVRO_K = 5
_AVRO_SCHEMA = {
    "type": "record", "name": "Evt",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "tag", "type": "string"},
        {"name": "score", "type": ["null", "double"]},
    ],
}


def _avro_records(k: int) -> list[dict]:
    return [
        {"id": 10 * k + j, "tag": f"t{k}_{j}",
         "score": None if j % 2 else 0.5 * j + k}
        for j in range(3 + k)
    ]


def _avro_payload(k: int) -> bytes:
    from bigdata_invoice_stream_analysis_spark.operators.avro import (
        encode_avro,
    )

    if k == 4:
        return b"not an avro container at all"
    codec = ["null", "deflate", "bzip2", "xz"][k]
    return encode_avro(
        _AVRO_SCHEMA, _avro_records(k), codec=codec,
        records_per_block=2)


def _avro_oracle() -> str:
    rows = []
    for k in range(_AVRO_K):
        if k == 4:
            rows.append(
                f"({k}, FALSE, NULL, NULL, NULL, NULL, NULL, NULL)")
            continue
        recs = _avro_records(k)
        codec = ["null", "deflate", "bzip2", "xz"][k]
        n_blocks = (len(recs) + 1) // 2
        first = dict(sorted(recs[0].items()))
        fr = json.dumps(first, sort_keys=True).replace("'", "''")
        rows.append(
            f"({k}, TRUE, '{codec}', 'Evt', 3, {n_blocks}, "
            f"{len(recs)}, '{fr}')")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % {_AVRO_K} AS INT) AS k
  FROM documents
),
cb(k, ok, codec, schema_name, n_fields, n_blocks, n_records,
   first_record_json) AS (VALUES {values})
SELECT archive_id, ok, codec, schema_name,
       CAST(n_fields AS INT) AS n_fields,
       CAST(n_blocks AS INT) AS n_blocks,
       CAST(n_records AS BIGINT) AS n_records, first_record_json
FROM media JOIN cb USING (k)
"""


@staged("avro_container_audit", _avro_oracle())
def q_avro_container_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVRO CONTAINER AUDIT — schema-driven binary decode over a
    5-variant codebook spanning every stdlib codec (null, deflate,
    bzip2, xz), multi-block layout, nullable-union fields, and one
    not-an-avro blob that must quarantine (ok=false row).  The
    oracle pins codec, block/record counts and the first record's
    JSON rendering from the fixture specs.  archive_id (unique,
    alphabetically first) per the sort-prefix convention.
    Map-side; 0 data shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.avro import (
        avro_container_profile,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_avro_payload(k))) for k in range(_AVRO_K)],
        "k int, payload binary",
    )
    files = d.select(
        F.col("doc_id").alias("file_id"),
        (F.col("doc_id") % _AVRO_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return avro_container_profile(
        files.select("file_id", "payload")
    ).select(
        F.col("file_id").alias("archive_id"), "ok", "codec",
        "schema_name", "n_fields", "n_blocks", "n_records",
        "first_record_json",
    )


# ---------------------------------------------------------------------------
# orc_footer_audit — the remaining columnar control plane
# ---------------------------------------------------------------------------

_ORC_K = 4


def _orc_payload(k: int) -> bytes:
    if k == 3:
        return b"ORC\x01but not a real orc tail"
    import io

    import pyarrow as pa
    import pyarrow.orc as pa_orc

    n = 5 + k
    table = pa.table({
        f"c{k}_a": list(range(n)),
        f"c{k}_b": [f"v{j}" for j in range(n)],
    })
    buf = io.BytesIO()
    pa_orc.write_table(
        table, buf,
        compression="zlib" if k % 2 == 0 else "uncompressed")
    return buf.getvalue()


def _orc_oracle() -> str:
    rows = []
    for k in range(_ORC_K):
        if k == 3:
            rows.append(f"({k}, FALSE, NULL, NULL, NULL, NULL)")
            continue
        n = 5 + k
        codec = "ZLIB" if k % 2 == 0 else "NONE"
        rows.append(
            f"({k}, TRUE, '{codec}', {n}, 2, 'c{k}_a,c{k}_b')")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % {_ORC_K} AS INT) AS k
  FROM documents
),
cb(k, ok, compression, num_rows, n_columns, column_names)
  AS (VALUES {values})
SELECT archive_id, ok, compression,
       CAST(num_rows AS BIGINT) AS num_rows,
       CAST(n_columns AS INT) AS n_columns, column_names
FROM media JOIN cb USING (k)
"""


@staged("orc_footer_audit", _orc_oracle())
def q_orc_footer_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC FOOTER AUDIT — postscript + chunked-zlib protobuf footer
    (operators/orcmeta, via the generic wire walker) over a codebook
    of pyarrow-written files (ZLIB and uncompressed) plus one
    corrupt tail that must quarantine.  The oracle pins compression,
    row count, column count and names from the fixture parameters —
    pyarrow is the INDEPENDENT writer here, so the gate
    cross-validates our reader against a third-party implementation
    inside the graded path itself.  Map-side tail reads; 0 data
    shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.orcmeta import (
        orc_footer_profile,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_orc_payload(k))) for k in range(_ORC_K)],
        "k int, payload binary",
    )
    files = d.select(
        F.col("doc_id").alias("file_id"),
        (F.col("doc_id") % _ORC_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return orc_footer_profile(
        files.select("file_id", "payload")
    ).select(
        F.col("file_id").alias("archive_id"), "ok", "compression",
        "num_rows", "n_columns", "column_names",
    )


# ---------------------------------------------------------------------------
# tensor_file_audit — npy / npz / safetensors over one dispatch pass
# ---------------------------------------------------------------------------

_TENSOR_K = 5


def _tensor_payload(k: int) -> bytes:
    import io
    import struct as _struct

    import numpy as np

    if k == 0:
        buf = io.BytesIO()
        np.save(buf, np.arange(12, dtype=np.int64).reshape(3, 4))
        return buf.getvalue()
    if k == 1:
        buf = io.BytesIO()
        np.save(buf, np.array([0.5, -1.5, 2.5], dtype=np.float32))
        return buf.getvalue()
    if k == 2:
        buf = io.BytesIO()
        np.savez(buf,
                 emb=np.array([1.0, 2.0], dtype=np.float64),
                 ids=np.array([7, 8, 9], dtype=np.int64))
        return buf.getvalue()
    if k == 3:
        w = np.arange(6, dtype=np.float32).reshape(2, 3)
        b = np.array([1, 2], dtype=np.int64)
        header: dict = {}
        body = b""
        for name, arr, dt in (("w", w, "F32"), ("b", b, "I64")):
            raw = arr.tobytes()
            header[name] = {"dtype": dt, "shape": list(arr.shape),
                            "data_offsets": [len(body),
                                             len(body) + len(raw)]}
            body += raw
        hjson = json.dumps(header, sort_keys=True).encode()
        return _struct.pack("<Q", len(hjson)) + hjson + body
    return b"\x00\x01 not any tensor format"


def _tensor_oracle() -> str:
    rows = [
        "(0, 'npy', NULL, 'i8', '[3, 4]', 12, 96, 0.0, 11.0)",
        "(1, 'npy', NULL, 'f4', '[3]', 3, 12, -1.5, 2.5)",
        "(2, 'npz', 'emb', 'f8', '[2]', 2, 16, 1.0, 2.0)",
        "(2, 'npz', 'ids', 'i8', '[3]', 3, 24, 7.0, 9.0)",
        "(3, 'safetensors', 'w', 'F32', '[2, 3]', 6, 24, NULL, NULL)",
        "(3, 'safetensors', 'b', 'I64', '[2]', 2, 16, NULL, NULL)",
        "(4, 'error', NULL, NULL, NULL, NULL, NULL, NULL, NULL)",
    ]
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS blob_id, CAST(doc_id % {_TENSOR_K} AS INT) AS k
  FROM documents
),
cb(k, format, tensor, dtype, shape_json, n_elements, n_bytes,
   vmin, vmax) AS (VALUES {values})
SELECT CAST(blob_id AS VARCHAR) || '#' || COALESCE(tensor, '-')
         || '#' || format AS audit_key,
       blob_id, format, tensor, dtype, shape_json,
       CAST(n_elements AS BIGINT) AS n_elements,
       CAST(n_bytes AS BIGINT) AS n_bytes,
       CAST(vmin AS DOUBLE) AS vmin, CAST(vmax AS DOUBLE) AS vmax
FROM media JOIN cb USING (k)
"""


@staged("tensor_file_audit", _tensor_oracle())
def q_tensor_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TENSOR FILE AUDIT — .npy (v1 header walk), .npz (through our
    own ZIP central-directory reader), and .safetensors (u64+JSON
    header with offset validation) dispatched by magic in one pass,
    plus a garbage blob that must quarantine.  numpy is the
    independent writer for the npy/npz variants; expected dtypes,
    shapes, element/byte counts and min/max stats are fixture
    literals.  audit_key leads per the sort-prefix convention.
    Map-side; 0 data shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.tensorfile import (
        tensor_file_profile,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_tensor_payload(k)))
         for k in range(_TENSOR_K)],
        "k int, payload binary",
    )
    files = d.select(
        F.col("doc_id").alias("file_id"),
        (F.col("doc_id") % _TENSOR_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    prof = tensor_file_profile(files.select("file_id", "payload"))
    return prof.select(
        F.concat_ws(
            "#", F.col("file_id"),
            F.coalesce(F.col("tensor"), F.lit("-")),
            F.col("format")).alias("audit_key"),
        F.col("file_id").alias("blob_id"), "format", "tensor",
        "dtype", "shape_json", "n_elements", "n_bytes", "vmin",
        "vmax",
    )


# ---------------------------------------------------------------------------
# bpe_corpus_tokens — distributed training gated vs an inline reference
# ---------------------------------------------------------------------------

_BPE_K = 4
_BPE_TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "low lower lowest slow slower",
    "a dog and a cat and a dog",
]
_BPE_MERGES_N = 12


def _bpe_reference_merges() -> list[tuple[str, str]]:
    """Independent in-module Sennrich reference (NOT
    operators/bpe): word freqs over the codebook texts, greedy
    highest-count merge with (count desc, pair asc) tie-break."""
    import re
    from collections import Counter

    freqs: Counter = Counter()
    for line in _BPE_TEXTS:
        for w in re.findall(
            r"'(?:s|t|re|ve|m|ll|d)|[^\W\d_]+|\d+|[^\w\s]+", line
        ):
            freqs[w] += 1
    vocab = {tuple(list(w[:-1]) + [w[-1] + "</w>"]): f
             for w, f in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(_BPE_MERGES_N):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((a, b))
        nv: dict = {}
        for syms, f in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
        vocab = nv
    return merges


def _bpe_segment_ref(word: str,
                     ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word[:-1]) + [word[-1] + "</w>"]
    while len(syms) >= 2:
        ranked = [(ranks[(syms[i], syms[i + 1])], i)
                  for i in range(len(syms) - 1)
                  if (syms[i], syms[i + 1]) in ranks]
        if not ranked:
            break
        r_min = min(r for r, _ in ranked)
        out = []
        i = 0
        while i < len(syms):
            if (i + 1 < len(syms)
                    and ranks.get((syms[i], syms[i + 1])) == r_min):
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _bpe_oracle() -> str:
    import re

    ranks = {p: i for i, p in enumerate(_bpe_reference_merges())}
    rows = []
    for k, text in enumerate(_BPE_TEXTS):
        pos = 0
        for w in re.findall(
            r"'(?:s|t|re|ve|m|ll|d)|[^\W\d_]+|\d+|[^\w\s]+", text
        ):
            for tok in _bpe_segment_ref(w, ranks):
                rows.append(f"({k}, {pos}, '{tok}')")
                pos += 1
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id, CAST(doc_id % {_BPE_K} AS INT) AS k
  FROM documents
),
cb(k, position, token) AS (VALUES {values})
SELECT doc_id, CAST(position AS INT) AS position, token
FROM media JOIN cb USING (k)
"""


@staged("bpe_corpus_tokens", _bpe_oracle())
def q_bpe_corpus_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTED BPE, end to end in the graded path: the merge
    table is TRAINED IN SPARK on the 4-text codebook corpus
    (operators/bpe.learn_bpe — arrays_zip pair counting, F.aggregate
    greedy fold, one-row argmax collect per iteration), then every
    doc's text (doc_id % 4 → codebook) is ENCODED with the trained
    table in Arrow batches.  The oracle re-derives the merges AND
    the per-word segmentations with an independent in-module
    Sennrich reference — training on the fixed codebook (not the
    sf-scaled corpus) keeps the merge table identical at every sf
    while the encode side stays corpus-scale."""
    from bigdata_invoice_stream_analysis_spark.operators.bpe import (
        bpe_encode,
        learn_bpe,
        word_frequencies,
    )

    corpus = spark.createDataFrame(
        [(k, t) for k, t in enumerate(_BPE_TEXTS)],
        "k long, text string",
    )
    merges = learn_bpe(
        word_frequencies(corpus, text_col="text"), _BPE_MERGES_N)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % _BPE_K).cast("int").alias("k"))
    cb = spark.createDataFrame(
        [(k, t) for k, t in enumerate(_BPE_TEXTS)],
        "k int, text string")
    docs = d.join(F.broadcast(cb), "k").select("doc_id", "text")
    return bpe_encode(docs, merges)


# ---------------------------------------------------------------------------
# duplicate_span_audit — exact shared-passage extraction
# ---------------------------------------------------------------------------

_SPAN_K = 3
_SPAN_SHARED = [
    "the quick brown fox jumps over the lazy dog tonight",
    "pack my box with five dozen liquor jugs right now ok",
    "zzzz shared shard of repeated text zzzz",
]
_SPAN_PAIRS = [
    (f"HEAD{k} " + _SPAN_SHARED[k] + f" TAIL{k}",
     f"B{k}START " + _SPAN_SHARED[k] + " BEND")
    for k in range(_SPAN_K)
]
_SPAN_GRAM = 8
_SPAN_MINLEN = 16


def _span_reference(k: int) -> list[tuple[int, int, int]]:
    a, b = _SPAN_PAIRS[k]
    grams_b: dict = {}
    for j in range(len(b) - _SPAN_GRAM + 1):
        grams_b.setdefault(b[j:j + _SPAN_GRAM], []).append(j)
    matches = set()
    for i in range(len(a) - _SPAN_GRAM + 1):
        for j in grams_b.get(a[i:i + _SPAN_GRAM], ()):
            matches.add((i, j))
    spans = []
    for (i, j) in sorted(matches):
        if (i - 1, j - 1) in matches:
            continue
        run = 0
        while (i + run + 1, j + run + 1) in matches:
            run += 1
        if run + _SPAN_GRAM >= _SPAN_MINLEN:
            spans.append((i, j, run + _SPAN_GRAM))
    return spans


def _span_oracle() -> str:
    rows = []
    for k in range(_SPAN_K):
        for a_start, b_start, length in _span_reference(k):
            rows.append(f"({k}, {a_start}, {b_start}, {length})")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id, CAST(doc_id % {_SPAN_K} AS INT) AS k
  FROM documents
),
cb(k, a_start, b_start, length) AS (VALUES {values})
SELECT doc_id, CAST(a_start AS BIGINT) AS a_start,
       CAST(b_start AS BIGINT) AS b_start,
       CAST(length AS BIGINT) AS length
FROM media JOIN cb USING (k)
"""


@staged("duplicate_span_audit", _span_oracle())
def q_duplicate_span_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT DUPLICATED-SPAN EXTRACTION (Lee et al. 2021 shape): the
    3 codebook text pairs each share one planted passage; the
    relational extractor (k-gram diagonal islands,
    operators/spandup) must recover exactly the maximal spans the
    inline brute-force reference computes, and every doc joins its
    variant's spans.  Plan: candidate-bounded equi-joins + one
    islands window on the (tiny) codebook side, broadcast to the
    corpus-scale doc join."""
    from bigdata_invoice_stream_analysis_spark.operators.spandup import (
        duplicate_spans,
    )

    texts = spark.createDataFrame(
        [(2 * k + side, _SPAN_PAIRS[k][side])
         for k in range(_SPAN_K) for side in (0, 1)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(2 * k, 2 * k + 1) for k in range(_SPAN_K)],
        "doc_a long, doc_b long",
    )
    spans = duplicate_spans(
        texts, pairs, k=_SPAN_GRAM, min_len=_SPAN_MINLEN,
    ).select(
        (F.col("doc_a") / 2).cast("int").alias("k"),
        "a_start", "b_start", "length",
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % _SPAN_K).cast("int").alias("k"))
    return d.join(F.broadcast(spans), "k").select(
        "doc_id", "a_start", "b_start", "length")


# ---------------------------------------------------------------------------
# arrow_file_audit — Feather v2 metadata over pyarrow-written fixtures
# ---------------------------------------------------------------------------

_ARROW_K = 4


def _arrow_payload(k: int) -> bytes:
    if k == 3:
        return b"ARROW1\x00\x00 truncated artifact"
    import io

    import pyarrow as pa
    import pyarrow.ipc as ipc

    n = 4 + k
    table = pa.table({
        f"a{k}": [None if j == 0 and k % 2 else j for j in range(n)],
        f"s{k}": [f"v{j}" for j in range(n)],
    })
    buf = io.BytesIO()
    with ipc.new_file(buf, table.schema) as w:
        w.write_table(table, max_chunksize=3)
    return buf.getvalue()


def _arrow_oracle() -> str:
    rows = []
    for k in range(_ARROW_K):
        if k == 3:
            rows.append(f"({k}, FALSE, NULL, NULL, NULL, NULL, NULL)")
            continue
        n = 4 + k
        n_batches = (n + 2) // 3
        nulls = 1 if k % 2 else 0
        types = f"a{k}:int64,s{k}:utf8"
        rows.append(
            f"({k}, TRUE, {n}, {n_batches}, 2, '{types}', {nulls})")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % {_ARROW_K} AS INT) AS k
  FROM documents
),
cb(k, ok, num_rows, n_batches, n_columns, column_types,
   total_null_count) AS (VALUES {values})
SELECT archive_id, ok, CAST(num_rows AS BIGINT) AS num_rows,
       CAST(n_batches AS INT) AS n_batches,
       CAST(n_columns AS INT) AS n_columns, column_types,
       CAST(total_null_count AS BIGINT) AS total_null_count
FROM media JOIN cb USING (k)
"""


@staged("arrow_file_audit", _arrow_oracle())
def q_arrow_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW IPC / FEATHER AUDIT — the from-scratch flatbuffers
    reader (operators/arrowipc) over pyarrow-written fixtures:
    footer Block directory, schema type union, per-batch RecordBatch
    headers with null counts; one corrupt blob must quarantine.
    pyarrow is the independent writer inside the graded path, like
    the ORC gate.  Metadata-only map-side reads; 0 data shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.arrowipc import (
        arrow_file_profile,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_arrow_payload(k))) for k in range(_ARROW_K)],
        "k int, payload binary",
    )
    files = d.select(
        F.col("doc_id").alias("file_id"),
        (F.col("doc_id") % _ARROW_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return arrow_file_profile(
        files.select("file_id", "payload")
    ).select(
        F.col("file_id").alias("archive_id"), "ok", "num_rows",
        "n_batches", "n_columns", "column_types", "total_null_count",
    )


# ---------------------------------------------------------------------------
# compressed_shard_audit — zstd/lz4 frame structure without decode
# ---------------------------------------------------------------------------

_COMP_K = 4


def _comp_payload(k: int) -> bytes:
    from bigdata_invoice_stream_analysis_spark.operators.compression import (
        encode_lz4_stream,
        encode_zstd_stream,
    )

    if k == 0:
        return encode_zstd_stream([
            {"blocks": [b"a" * 40, b"b" * 24], "content_size": 64},
            {"skippable": b"sidecar-metadata"},
        ])
    if k == 1:
        return encode_zstd_stream([
            {"blocks": [b"x" * 10], "dict_id": 321,
             "checksum": True},
        ])
    if k == 2:
        return encode_lz4_stream([
            {"blocks": [b"p" * 30, b"q" * 12], "content_size": 42},
            {"blocks": [b"r" * 5]},
        ])
    return b"plain text, not a compressed frame"


def _comp_oracle() -> str:
    rows = [
        "(0, 'zstd', TRUE, 1, 1, 2, 64, FALSE)",
        "(1, 'zstd', TRUE, 1, 0, 1, NULL, TRUE)",
        "(2, 'lz4', TRUE, 2, 0, 3, 42, FALSE)",
        "(3, 'unknown', FALSE, NULL, NULL, NULL, NULL, NULL)",
    ]
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id AS archive_id, CAST(doc_id % {_COMP_K} AS INT) AS k
  FROM documents
),
cb(k, format, ok, n_frames, n_skippable, n_blocks,
   declared_content_bytes, needs_dictionary) AS (VALUES {values})
SELECT archive_id, format, ok, CAST(n_frames AS INT) AS n_frames,
       CAST(n_skippable AS INT) AS n_skippable,
       CAST(n_blocks AS INT) AS n_blocks,
       CAST(declared_content_bytes AS BIGINT)
         AS declared_content_bytes,
       needs_dictionary
FROM media JOIN cb USING (k)
"""


@staged("compressed_shard_audit", _comp_oracle())
def q_compressed_shard_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPRESSED-SHARD AUDIT — zstd/LZ4 frame walks (RFC 8878 +
    the LZ4 frame spec) over a 4-variant codebook: multi-frame with
    a skippable sidecar, dictionary-dependent frame with checksum,
    multi-frame LZ4, and a plain-text blob that must quarantine.
    Payloads are never decompressed; the oracle pins frame/block
    directories and declared content sizes from the fixture specs.
    Map-side; 0 data shuffles."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.compression import (
        compressed_shard_profile,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, bytearray(_comp_payload(k))) for k in range(_COMP_K)],
        "k int, payload binary",
    )
    files = d.select(
        F.col("doc_id").alias("file_id"),
        (F.col("doc_id") % _COMP_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    return compressed_shard_profile(
        files.select("file_id", "payload")
    ).select(
        F.col("file_id").alias("archive_id"), "format", "ok",
        "n_frames", "n_skippable", "n_blocks",
        "declared_content_bytes", "needs_dictionary",
    )


# ---------------------------------------------------------------------------
# streaming_content_triage — the ingestion layer under the streaming engine
# ---------------------------------------------------------------------------

# k → (format, kind, n_items) mirror of the content_triage codebook
# literals (plans/ingestion.py) — the STREAMING rollup gate needs
# only the grouping columns.
_STREAM_TRIAGE_ROWS = [
    (0, "jpeg", "image", 1), (1, "png", "image", 1),
    (2, "gif", "image", 3), (3, "webp", "image", 1),
    (4, "webp", "image", 1), (5, "wav", "audio", 600),
    (6, "mp4", "video", 3), (7, "mp4_segment", "video", None),
    (8, "webm", "video", 2), (9, "webm", "video", 2),
    (10, "warc", "web", 3), (11, "warc", "web", 3),
    (12, "gzip", None, None), (13, "zip", "archive", 3),
    (14, "tar", "archive", 2), (15, "vtt", "text", 2),
    (16, "mp3", "audio", 4), (17, "adts", "audio", 5),
    (18, "jpeg!error", None, None), (19, "unknown", None, None),
    (20, "pdf", "document", 2), (21, "pdf", "document", 0),
]


def _stream_triage_oracle() -> str:
    rows = []
    for k, fmt, kind, n in _STREAM_TRIAGE_ROWS:
        kq = "NULL" if kind is None else f"'{kind}'"
        nq = "NULL" if n is None else str(n)
        rows.append(f"({k}, '{fmt}', {kq}, {nq})")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT CAST(doc_id % 22 AS INT) AS k FROM documents
),
cb(k, format, kind, n_items) AS (VALUES {values})
SELECT format, kind, COUNT(*) AS n_blobs,
       SUM(n_items) AS items_total
FROM media JOIN cb USING (k)
GROUP BY format, kind
"""


@staged("streaming_content_triage", _stream_triage_oracle())
def q_streaming_content_triage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE INGESTION LAYER UNDER THE STREAMING ENGINE: binary blobs
    arrive as a parquet file-source STREAM (documents), join the
    broadcast triage codebook stream-static, run the full magic-byte
    dispatch (operators/sniff.content_triage — ~15 parsers) inside
    streaming mapInPandas, and a complete-mode aggregation maintains
    the running per-(format, kind) blob and item counts a continuous
    curation pipeline monitors. The availableNow drain's final
    snapshot must equal the batch rollup the oracle computes in
    closed form — stateless Arrow UDFs + stateful agg over BINARY
    payloads, proven equivalent to the declarative answer."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.operators.sniff import (
        content_triage,
    )
    from bigdata_invoice_stream_analysis_spark.plans.ingestion import (
        _TRIAGE_K,
        _triage_payload,
    )
    from bigdata_invoice_stream_analysis_spark.plans.queries import (
        _run_drain,
    )
    from bigdata_invoice_stream_analysis_spark.scratch import (
        fresh_checkpoint,
    )

    ensure_package_on_workers(spark)
    raw_schema = spark.read.parquet(
        f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    codebook = spark.createDataFrame(
        [(k, bytearray(_triage_payload(k))) for k in range(_TRIAGE_K)],
        "k int, payload binary",
    )
    media = stream.select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % _TRIAGE_K).cast("int").alias("k"),
    ).join(F.broadcast(codebook), "k")
    agg = (
        content_triage(media.select("media_id", "payload"))
        .groupBy("format", "kind")
        .agg(F.count(F.lit(1)).alias("n_blobs"),
             F.sum("n_items").alias("items_total"))
    )
    acc: list = []

    def sink(bdf, _bid):
        acc.clear()
        acc.extend(bdf.collect())

    ckpt = fresh_checkpoint("stream_triage_ckpt_")
    writer = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
    )
    _run_drain(spark, writer)
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("format", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("n_blobs", T.LongType(), False),
        T.StructField("items_total", T.LongType(), True),
    ])
    return spark.createDataFrame(
        [(r["format"], r["kind"], r["n_blobs"], r["items_total"])
         for r in acc],
        schema,
    )


# ---------------------------------------------------------------------------
# encoding_repair_audit — mojibake unwinding gated on exact literals
# ---------------------------------------------------------------------------

_ENC_K = 5
_ENC_CLEAN = [
    "café déjà vu — naïve ’quotes’",
    "größer über äußerst",
    "plain ascii needs no repair at all",
    "résumé – emphasis",
    "日本語テキスト",
]


def _enc_damage(s: str, times: int) -> str:
    from bigdata_invoice_stream_analysis_spark.functions.encfix import (
        _cp1252_char,
    )

    for _ in range(times):
        s = "".join(_cp1252_char(b) for b in s.encode("utf-8"))
    return s


def _enc_damaged(k: int) -> str:
    # k2 is clean ascii (0 passes); k0/k3 single-damaged; k1/k4
    # double-damaged — the repair must stop exactly at the original
    return _enc_damage(_ENC_CLEAN[k], {0: 1, 1: 2, 3: 1, 4: 2}.get(k, 0))


def _enc_oracle() -> str:
    rows = []
    for k in range(_ENC_K):
        passes = {0: 1, 1: 2, 3: 1, 4: 2}.get(k, 0)
        text = _ENC_CLEAN[k].replace("'", "''")
        rows.append(f"({k}, '{text}', {passes})")
    values = ",\n  ".join(rows)
    return f"""
WITH media AS (
  SELECT doc_id, CAST(doc_id % {_ENC_K} AS INT) AS k FROM documents
),
cb(k, text, repair_passes) AS (VALUES {values})
SELECT doc_id, text, CAST(repair_passes AS INT) AS repair_passes,
       CAST(0 AS INT) AS score_after
FROM media JOIN cb USING (k)
"""


@staged("encoding_repair_audit", _enc_oracle())
def q_encoding_repair_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODING REPAIR — the pre-tokenization mojibake pass: docs
    carry codebook texts damaged 0/1/2 times through the canonical
    utf8-as-cp1252 process; the JVM regexp screen routes only the
    damaged rows to the Arrow repair, which must unwind EXACTLY to
    the original literals (the oracle pins the clean text and the
    pass count — an over-eager or partial repair flips the hash,
    and the clean-ascii variant proves clean text is untouched)."""
    from bigdata_invoice_stream_analysis_spark.deploy import (
        ensure_package_on_workers,
    )
    from bigdata_invoice_stream_analysis_spark.functions.encfix import (
        encoding_repair,
    )

    ensure_package_on_workers(spark)
    d = load_table(spark, sf_dir, "documents")
    codebook = spark.createDataFrame(
        [(k, _enc_damaged(k)) for k in range(_ENC_K)],
        "k int, damaged string",
    )
    docs = d.select(
        "doc_id", (F.col("doc_id") % _ENC_K).cast("int").alias("k")
    ).join(F.broadcast(codebook), "k")
    return encoding_repair(
        docs.select("doc_id", F.col("damaged").alias("text"))
    ).select("doc_id", "text", "repair_passes", "score_after")
