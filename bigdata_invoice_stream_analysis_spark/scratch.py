"""Per-session scratch space for layout-gate writes and streaming
checkpoints.

The lakehouse layout gates (partitioned_write_prune,
schema_evolution_merge, bucketed_join_revenue) write real data copies
and the streaming drain gates write checkpoint directories; with bare
``tempfile.mkdtemp`` every bench/parity/driver invocation leaked a new
copy to /tmp for the life of the machine. All such paths now live
under ONE per-process root that is removed at interpreter exit.

Two flavors:
  * ``scratch_dir(name)`` — a STABLE subdir, reused (and overwritten
    via ``mode("overwrite")``) across invocations in the same session,
    so repeated sweeps hold at most one copy of a gate's data.
  * ``fresh_checkpoint(name)`` — a FRESH dir per call. Streaming
    checkpoints cannot be reused: an availableNow restart against an
    old checkpoint resumes from its commit log and re-emits nothing,
    which would silently empty a gate's second run in one session.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

_ROOT: str | None = None

# /dev/shm must have at least this much free before scratch prefers it
# (a few GB: the largest observed drain scratch footprint is well under
# 1 GB at bench volume; 4 GB leaves headroom without demanding a
# server-sized tmpfs).
_SHM_MIN_FREE_BYTES = 4 << 30


def _scratch_base() -> str | None:
    """Directory to create the per-process scratch root under.

    Order: $SPARK_GRAFT_SCRATCH_DIR (deployment override), then
    /dev/shm when it is a writable tmpfs (r9, guide §6): the scratch
    root holds streaming checkpoints, state-store files and staged
    micro-batch buckets — hundreds of SMALL files created/renamed/
    fsynced per drain. On this sandbox /tmp is ext4-on-virtio while
    /dev/shm is a 128 GB tmpfs; moving the same stream-stream join
    drain's checkpoints to tmpfs cut its wall time 10.2 s → 8.5 s with
    zero code change. Scratch is ephemeral by definition (removed at
    interpreter exit), so a RAM-backed medium is semantically free; a
    production deployment points this at fast local SSD via the env
    var (checkpoints that must SURVIVE go to durable storage and are
    not scratch). Falls back to the tempfile default when neither is
    available.

    The /dev/shm preference is gated on a free-space floor (r10,
    ADVICE): Docker's default /dev/shm is 64 MB, and drain
    checkpoints + staged buckets can exceed that — an ungated
    preference would turn previously-passing drains into ENOSPC
    failures in common container environments, and RAM-backed scratch
    competes with executor memory. The explicit env override is never
    second-guessed."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        return env
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        try:
            st = os.statvfs(shm)
            if st.f_bavail * st.f_frsize >= _SHM_MIN_FREE_BYTES:
                return shm
        except OSError:
            pass
    return None


def _root() -> str:
    global _ROOT
    if _ROOT is None:
        _ROOT = tempfile.mkdtemp(
            prefix="spark_graft_scratch_", dir=_scratch_base()
        )
        atexit.register(shutil.rmtree, _ROOT, ignore_errors=True)
    return _ROOT


def scratch_dir(name: str) -> str:
    """Stable per-session scratch subdir (caller overwrites in place)."""
    d = os.path.join(_root(), name)
    os.makedirs(d, exist_ok=True)
    return d


def fresh_checkpoint(name: str) -> str:
    """Fresh checkpoint dir under the session scratch root."""
    return tempfile.mkdtemp(prefix=name, dir=scratch_dir("ckpt"))
