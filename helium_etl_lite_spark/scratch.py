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


def scratch_dir(name: str) -> str:
    """Per-query scratch directory: deterministic path keyed on `name`,
    emptied on every call. Callers run serially within a driver/bench
    process; the wipe-at-start discipline makes each invocation start
    from a clean slate (and doubles as cleanup for the previous run)."""
    base = os.path.join(tempfile.gettempdir(), "helium_spark_scratch", name)
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    return base
