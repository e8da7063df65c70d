"""Deterministic scratch space for queries with side-effect writes.

Several declared queries exercise sink/source round-trips or persisted
incremental state; they need a filesystem location that (a) does not
collide across queries and (b) does not LEAK one temp directory per
invocation — the bench protocol re-runs each query n>=5 times per round,
and `tempfile.mkdtemp` per call left orphaned state dirs behind.

`scratch_dir(name)` returns the same path for the same name within a
machine, wiping any previous contents first, so repeated runs are
self-cleaning and a given query's reads never see a stale prior write.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

# Age-based GC fallback for pid-reuse (see scratch_dir docstring).
_MAX_AGE_SECONDS = 6 * 3600.0


def scratch_dir(name: str) -> str:
    """Per-query scratch directory: deterministic path keyed on
    (`name`, pid), emptied on every call. Callers run serially WITHIN a
    driver process; the pid component keeps two concurrent processes
    (pytest + bench, or two bench runs) from rmtree-ing each other's
    incremental state mid-query (review finding). Leak discipline:
    every call garbage-collects sibling dirs whose owning process is
    gone, so crashed/finished runs leave nothing behind — the same
    self-cleaning guarantee the single-dir form had, without the
    cross-process race.

    Liveness is probed via /proc/<pid> (Linux-only, matching this
    harness). A recycled pid would make a stale dir look live forever
    (r6 ADVICE), so an AGE fallback backs it up: dirs older than
    _MAX_AGE_SECONDS (6 h — far beyond any query run) are reclaimed
    even when a same-numbered process exists. A genuinely live sibling
    that old would lose its scratch; no query here runs remotely that
    long, and its next scratch_dir call recreates the dir anyway."""
    root = os.path.join(tempfile.gettempdir(), "helium_spark_scratch")
    os.makedirs(root, exist_ok=True)
    prefix = name + ".pid"
    now = time.time()
    for d in os.listdir(root):
        if d.startswith(prefix):
            pid = d[len(prefix):]
            path = os.path.join(root, d)
            try:
                age = now - os.path.getmtime(path)
            except OSError:
                age = 0.0
            if (
                not pid.isdigit()
                or not os.path.exists(f"/proc/{pid}")
                or age > _MAX_AGE_SECONDS
            ):
                shutil.rmtree(path, ignore_errors=True)
    base = os.path.join(root, f"{prefix}{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return base


def scratch_path(name: str) -> str:
    """Read-only twin of scratch_dir: the path the CURRENT process's
    scratch for `name` lives at, without wiping or GC — for tests and
    tools that inspect what a query just wrote (calling scratch_dir
    again would destroy it)."""
    root = os.path.join(tempfile.gettempdir(), "helium_spark_scratch")
    return os.path.join(root, f"{name}.pid{os.getpid()}")
