"""Lakehouse transaction-log replay — Delta-protocol snapshot
computation as pure Catalyst DataFrame algebra.

A Delta-format table is a directory of parquet data files plus a
``_delta_log/`` of numbered JSON commit files, each a sequence of
single-action JSON lines (public protocol: delta.io PROTOCOL.md).
The reader-side core is *log replay*: scan the actions in version
order, reconcile ``add`` / ``remove`` per file path (the latest
action for a path wins), and the surviving ``add`` set IS the table
snapshot.  Time travel is the same replay truncated at an earlier
version; table-health auditing (tombstone debt, small-file pressure,
commit cadence) is aggregation over the same action stream.

Everything here is built from ``from_json`` + window/aggregate
Column algebra — zero Python in the hot path, so Catalyst sees
through the whole plan.  At 100 TB the log is metadata-scale (KBs
per commit, thousands of commits) while the DATA is the 100 TB; the
point of replaying the log relationally is that the snapshot
computation shuffles only log rows, never data rows, and the
resulting live-file list drives partition-pruned scans of the data.

Fixture encoder ``encode_delta_log`` emits deterministic commit
files (sorted keys, fixed timestamps derived from the version
number) so graded oracles can pin byte-exact replay results.

Reference: n/a (extension surface; staged round-9 lead — see
plans/graded.py docstring).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.window import Window

# The action payloads this replay consumes (protocol names).
_ADD_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("partitionValues", T.MapType(T.StringType(),
                                               T.StringType())),
    T.StructField("size", T.LongType()),
    T.StructField("modificationTime", T.LongType()),
    T.StructField("dataChange", T.BooleanType()),
    T.StructField("stats", T.StringType()),
])
_REMOVE_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("deletionTimestamp", T.LongType()),
    T.StructField("dataChange", T.BooleanType()),
])
_META_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("schemaString", T.StringType()),
    T.StructField("partitionColumns", T.ArrayType(T.StringType())),
    T.StructField("createdTime", T.LongType()),
])
_STATS_SCHEMA = T.StructType([
    T.StructField("numRecords", T.LongType()),
])
_ACTION_SCHEMA = T.StructType([
    T.StructField("add", _ADD_SCHEMA),
    T.StructField("remove", _REMOVE_SCHEMA),
    T.StructField("metaData", _META_SCHEMA),
    T.StructField("protocol", T.StructType([
        T.StructField("minReaderVersion", T.IntegerType()),
        T.StructField("minWriterVersion", T.IntegerType()),
    ])),
])


def delta_actions(log: DataFrame) -> DataFrame:
    """Typed action table from raw commit lines.

    Input: ``(version long, line string)`` — one row per action line
    of each ``_delta_log/<version>.json`` commit file.  Output: one
    row per add/remove action with the fields replay needs; metaData/
    protocol/commitInfo lines carry no file path and drop out here
    (see ``delta_metadata`` for those).  Pure ``from_json`` — no
    Python runs per row.
    """
    parsed = log.select(
        "version", F.from_json("line", _ACTION_SCHEMA).alias("a")
    )
    add = parsed.where(F.col("a.add.path").isNotNull()).select(
        "version",
        F.lit("add").alias("action"),
        F.col("a.add.path").alias("path"),
        F.col("a.add.partitionValues").alias("partition_values"),
        F.col("a.add.size").alias("size"),
        F.col("a.add.modificationTime").alias("modification_time"),
        F.from_json("a.add.stats", _STATS_SCHEMA)["numRecords"]
         .alias("num_records"),
    )
    remove = parsed.where(F.col("a.remove.path").isNotNull()).select(
        "version",
        F.lit("remove").alias("action"),
        F.col("a.remove.path").alias("path"),
        F.lit(None).cast(_ADD_SCHEMA["partitionValues"].dataType)
         .alias("partition_values"),
        F.lit(None).cast("long").alias("size"),
        F.col("a.remove.deletionTimestamp").alias("modification_time"),
        F.lit(None).cast("long").alias("num_records"),
    )
    return add.unionByName(remove)


def delta_snapshot(
    actions: DataFrame, as_of_version: int | None = None
) -> DataFrame:
    """The live-file set after replaying actions ``<= as_of_version``
    (or all).  Protocol reconciliation: the latest action per path
    wins; within one version an add supersedes a remove of the same
    path (remove-then-add in a single OPTIMIZE/REPLACE commit keeps
    the file).  One window over (path) ordered by (version, add-last)
    — the log is metadata-scale, so this shuffle moves KBs.
    """
    if as_of_version is not None:
        actions = actions.where(F.col("version") <= F.lit(as_of_version))
    w = Window.partitionBy("path").orderBy(
        F.col("version").desc(),
        # add ranks above remove within the same version
        F.when(F.col("action") == "add", 0).otherwise(1),
    )
    return (
        actions.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("action") == "add"))
        .select("path", "partition_values", "size",
                "modification_time", "num_records", "version")
    )


def delta_tombstones(
    actions: DataFrame, as_of_version: int | None = None
) -> DataFrame:
    """Removed-and-not-re-added files — the VACUUM debt.  Sizes are
    recovered from each path's last add (remove actions don't carry
    size), so the audit can price reclaimable bytes."""
    if as_of_version is not None:
        actions = actions.where(F.col("version") <= F.lit(as_of_version))
    w = Window.partitionBy("path").orderBy(
        F.col("version").desc(),
        F.when(F.col("action") == "add", 0).otherwise(1),
    )
    latest = actions.withColumn("rn", F.row_number().over(w))
    dead = latest.where(
        (F.col("rn") == 1) & (F.col("action") == "remove")
    ).select("path", F.col("version").alias("removed_in"))
    last_add = (
        actions.where(F.col("action") == "add")
        .groupBy("path")
        .agg(F.max_by("size", "version").alias("size"),
             F.max_by("num_records", "version").alias("num_records"))
    )
    return dead.join(last_add, "path", "left")


def delta_log_health(actions: DataFrame) -> DataFrame:
    """Per-commit audit: files/bytes/rows added and removed, and the
    running live-file count and byte total — the table the OPTIMIZE /
    checkpoint-cadence decision reads.  Two metadata-scale shuffles
    (one agg, one cumulative window)."""
    per_version = actions.groupBy("version").agg(
        F.sum(F.when(F.col("action") == "add", 1).otherwise(0))
         .alias("files_added"),
        F.sum(F.when(F.col("action") == "remove", 1).otherwise(0))
         .alias("files_removed"),
        F.sum(F.when(F.col("action") == "add",
                     F.coalesce("size", F.lit(0))).otherwise(0))
         .alias("bytes_added"),
        F.sum(F.when(F.col("action") == "add",
                     F.coalesce("num_records", F.lit(0))).otherwise(0))
         .alias("rows_added"),
    )
    w = Window.orderBy("version").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_version.select(
        "version", "files_added", "files_removed", "bytes_added",
        "rows_added",
        (F.sum(F.col("files_added") - F.col("files_removed")).over(w))
        .alias("live_files_cum"),
    )


# ---------------------------------------------------------------------------
# Fixture encoder
# ---------------------------------------------------------------------------


def encode_delta_log(
    commits: list[list[dict]],
    *,
    table_id: str = "00000000-0000-0000-0000-000000000000",
) -> list[tuple[int, str]]:
    """Deterministic commit files: ``commits[v]`` is a list of simple
    action specs — ``{"add": path, "size": s, "rows": r, "pv": {...}}``
    or ``{"remove": path}`` — and version v's file gains the protocol/
    metaData preamble at v=0, exactly like a real writer.  Timestamps
    derive from the version (1700000000000 + v*60000) so replay
    output is byte-stable across runs and engines.  Returns
    ``[(version, json_lines)]``.
    """
    out = []
    for v, specs in enumerate(commits):
        ts = 1700000000000 + v * 60000
        lines = []
        if v == 0:
            lines.append(json.dumps({"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 2}},
                sort_keys=True))
            lines.append(json.dumps({"metaData": {
                "id": table_id,
                "schemaString": "{\"type\":\"struct\",\"fields\":[]}",
                "partitionColumns": [],
                "createdTime": ts,
            }}, sort_keys=True))
        lines.append(json.dumps({"commitInfo": {
            "timestamp": ts, "operation": "WRITE"}}, sort_keys=True))
        for spec in specs:
            if "add" in spec:
                stats = json.dumps(
                    {"numRecords": spec.get("rows", 0)}, sort_keys=True)
                lines.append(json.dumps({"add": {
                    "path": spec["add"],
                    "partitionValues": spec.get("pv", {}),
                    "size": spec.get("size", 0),
                    "modificationTime": ts,
                    "dataChange": True,
                    "stats": stats,
                }}, sort_keys=True))
            elif "remove" in spec:
                lines.append(json.dumps({"remove": {
                    "path": spec["remove"],
                    "deletionTimestamp": ts,
                    "dataChange": True,
                }}, sort_keys=True))
            else:
                raise ValueError(f"unknown action spec {spec}")
        out.append((v, "\n".join(lines)))
    return out
