"""Seat-calibration probe (bench.py) + the compare script's seat note.

Round-9 motivation: the r8 driver artifact ran zero-churn trivial
queries 1.4-1.9x slower than the committed quiet artifact on identical
code, and the r9 quiet run measured a 1.46x MEDIAN ratio on 186
unchanged batch rows vs the r8 quiet seat. A uniform multiplier across
pure-metadata scans cannot come from a plan regression, so every bench
artifact now records a deterministic CPU probe that future rounds can
normalize drift against, and scripts/bench_compare.py prints the
seat-speed ratio when both artifacts carry one.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

from bench import _proc_stat_jiffies, _seat_probe  # noqa: E402


def test_seat_probe_shape_and_sanity():
    probe = _seat_probe()
    assert set(probe) == {
        "sha256_64mib_s",
        "pyloop_3m_s",
        "sha256_parallel_64mib_x_cpus_s",
        "cpus",
    }
    assert probe["cpus"] >= 1
    # A probe that takes 0 time measured nothing; one that takes >30 s
    # would be a bench-latency bug, not a calibration.
    for key in ("sha256_64mib_s", "pyloop_3m_s",
                "sha256_parallel_64mib_x_cpus_s"):
        assert 0.0 < probe[key] < 30.0, (key, probe[key])


def test_proc_stat_jiffies_linux():
    stat = _proc_stat_jiffies()
    assert stat is not None  # the target environment is Linux
    assert {"user", "system", "idle", "steal"} <= set(stat)
    assert all(isinstance(v, int) and v >= 0 for v in stat.values())


def _artifact(path: str, queries: dict, seat_par: float | None) -> None:
    art = {"sf": 0.1, "queries": queries, "diet_keep_1_in": 8}
    if seat_par is not None:
        art["seat"] = {
            "probe_start": {"sha256_parallel_64mib_x_cpus_s": seat_par}
        }
    with open(path, "w") as fh:
        json.dump(art, fh)


def test_bench_compare_seat_note(tmp_path):
    base = str(tmp_path / "base.json")
    cur = str(tmp_path / "cur.json")
    # Current seat 2x slower, queries 2x slower -> normalized 1.00x and
    # the raw gate must NOT trip (1.9x < 2.0 threshold used below).
    _artifact(base, {"q1": 1.0, "q2": 2.0}, seat_par=0.10)
    _artifact(cur, {"q1": 1.9, "q2": 3.8}, seat_par=0.19)
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "scripts", "bench_compare.py"),
         "--baseline", base, "--current", cur],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "seat-normalized total = 1.00x" in proc.stdout, proc.stdout
    assert "1.90x slower seat" in proc.stdout, proc.stdout


def test_bench_compare_no_seat_note_without_probe(tmp_path):
    base = str(tmp_path / "base.json")
    cur = str(tmp_path / "cur.json")
    _artifact(base, {"q1": 1.0}, seat_par=None)  # r01-era artifact
    _artifact(cur, {"q1": 1.2}, seat_par=0.15)
    proc = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "scripts", "bench_compare.py"),
         "--baseline", base, "--current", cur],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "seat-normalized" not in proc.stdout
