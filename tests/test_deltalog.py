"""Delta-protocol log replay: add/remove reconciliation, time
travel, tombstone audit, health rollup — validated against a pure
Python replay model and an end-to-end table directory whose data
files are written by our own parquet writer."""

from __future__ import annotations

import sys
from pathlib import Path

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bigdata_invoice_stream_analysis_spark.operators.deltalog import (
    delta_actions,
    delta_log_health,
    delta_snapshot,
    delta_tombstones,
    encode_delta_log,
)

COMMITS = [
    [{"add": "p0.parquet", "size": 100, "rows": 10},
     {"add": "p1.parquet", "size": 200, "rows": 20}],
    [{"add": "p2.parquet", "size": 300, "rows": 30,
      "pv": {"day": "2024-01-02"}}],
    # OPTIMIZE: p0+p1 compacted into p3
    [{"remove": "p0.parquet"}, {"remove": "p1.parquet"},
     {"add": "p3.parquet", "size": 280, "rows": 30}],
    # re-add of a previously removed path
    [{"add": "p0.parquet", "size": 120, "rows": 12}],
]


def _log_df(spark, commits=COMMITS):
    rows = []
    for v, body in encode_delta_log(commits):
        for line in body.split("\n"):
            rows.append((v, line))
    return spark.createDataFrame(rows, "version long, line string")


def _python_replay(commits, as_of=None):
    live = {}
    for v, specs in enumerate(commits):
        if as_of is not None and v > as_of:
            break
        removed = set()
        for spec in specs:
            if "remove" in spec:
                removed.add(spec["remove"])
            if "add" in spec:
                live[spec["add"]] = (v, spec.get("size", 0),
                                     spec.get("rows", 0))
        for p in removed:
            # add in the same commit supersedes the remove
            if p in live and live[p][0] == v:
                continue
            live.pop(p, None)
    return live


def test_snapshot_replay_semantics(spark):
    snap = {r["path"]: r for r
            in delta_snapshot(delta_actions(_log_df(spark))).collect()}
    model = _python_replay(COMMITS)
    assert set(snap) == set(model) == {
        "p0.parquet", "p2.parquet", "p3.parquet"}
    for p, (v, size, rows) in model.items():
        assert snap[p]["version"] == v
        assert snap[p]["size"] == size
        assert snap[p]["num_records"] == rows
    assert snap["p2.parquet"]["partition_values"] == {
        "day": "2024-01-02"}


def test_time_travel_as_of_version(spark):
    actions = delta_actions(_log_df(spark))
    for as_of in range(len(COMMITS)):
        snap = {r["path"] for r
                in delta_snapshot(actions, as_of_version=as_of).collect()}
        assert snap == set(_python_replay(COMMITS, as_of)), as_of


def test_tombstones_recover_sizes(spark):
    actions = delta_actions(_log_df(spark))
    # at version 2: p0 and p1 are tombstones with their last-add sizes
    dead = {r["path"]: r for r in
            delta_tombstones(actions, as_of_version=2).collect()}
    assert set(dead) == {"p0.parquet", "p1.parquet"}
    assert dead["p0.parquet"]["size"] == 100
    assert dead["p1.parquet"]["size"] == 200
    assert dead["p0.parquet"]["removed_in"] == 2
    # at HEAD: p0 was re-added, only p1 remains dead
    dead = {r["path"] for r in delta_tombstones(actions).collect()}
    assert dead == {"p1.parquet"}


def test_log_health_running_totals(spark):
    health = {r["version"]: r for r in
              delta_log_health(delta_actions(_log_df(spark))).collect()}
    assert health[0]["files_added"] == 2
    assert health[0]["bytes_added"] == 300
    assert health[2]["files_removed"] == 2
    assert [health[v]["live_files_cum"] for v in range(4)] == [
        2, 3, 2, 3]


def test_end_to_end_table_dir(spark, tmp_path):
    """A real mini-table: parquet data files from our own writer +
    a _delta_log; replay the log, scan ONLY the live files, and the
    scanned row counts must equal the stats carried in the log."""
    from bigdata_invoice_stream_analysis_spark.operators.parquetmeta import (
        encode_parquet,
    )

    tdir = tmp_path / "table"
    (tdir / "_delta_log").mkdir(parents=True)
    datasets = {
        "a.parquet": [1, 2, 3],
        "b.parquet": [4, 5],
        "c.parquet": [6, 7, 8, 9],
    }
    for name, vals in datasets.items():
        (tdir / name).write_bytes(
            encode_parquet([("v", "int64", vals)]))
    commits = [
        [{"add": "a.parquet", "size": 1, "rows": 3},
         {"add": "b.parquet", "size": 1, "rows": 2}],
        [{"remove": "b.parquet"},
         {"add": "c.parquet", "size": 1, "rows": 4}],
    ]
    for v, body in encode_delta_log(commits):
        (tdir / "_delta_log" / f"{v:020d}.json").write_text(body)

    log = spark.read.text(str(tdir / "_delta_log" / "*.json")).select(
        F.regexp_extract(
            F.input_file_name(), r"(\d+)\.json$", 1
        ).cast("long").alias("version"),
        F.col("value").alias("line"),
    )
    snap = delta_snapshot(delta_actions(log)).collect()
    live = {r["path"]: r["num_records"] for r in snap}
    assert live == {"a.parquet": 3, "c.parquet": 4}
    for path, claimed in live.items():
        actual = spark.read.parquet(str(tdir / path)).count()
        assert actual == claimed


_ACTION = st.one_of(
    st.tuples(st.just("add"), st.integers(0, 5),
              st.integers(1, 500), st.integers(1, 50)),
    st.tuples(st.just("remove"), st.integers(0, 5),
              st.just(0), st.just(0)),
)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.lists(_ACTION, min_size=1, max_size=4),
                min_size=1, max_size=5))
def test_property_replay_matches_python_model(spark, commit_specs):
    commits = [
        [({"add": f"f{i}.parquet", "size": s, "rows": r}
          if kind == "add" else {"remove": f"f{i}.parquet"})
         for kind, i, s, r in specs]
        for specs in commit_specs
    ]
    # dedup within a commit: at most one action per (kind, path) —
    # two same-version adds of one path are outside the protocol and
    # would make the replay tie-broken arbitrarily
    deduped = []
    for specs in commits:
        seen: dict = {}
        for d in specs:
            kind = "add" if "add" in d else "remove"
            seen[(kind, d.get("add") or d.get("remove"))] = d
        deduped.append(list(seen.values()))
    commits = deduped
    snap = {r["path"]: (r["version"], r["size"], r["num_records"])
            for r in delta_snapshot(
                delta_actions(_log_df(spark, commits))).collect()}
    model = _python_replay(commits)
    assert snap == model
