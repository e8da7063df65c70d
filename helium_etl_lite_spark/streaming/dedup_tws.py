"""Streaming first-seen dedup as a Spark 4 stateful-v2 operator
(`transformWithStateInPandas`).

`stream_dedup_by_key` (queries/streaming_batch.py) models dedup with
`dropDuplicates` and the batch twin; `streaming/dedup_stream.py` runs
the near-dup MinHash ingest via foreachBatch. This operator is the
third shape: exact first-occurrence-wins dedup as an explicit
StatefulProcessor, the API that replaces applyInPandasWithState in
Spark 4 — typed per-key state handles (value/list/map), timers, and
native state TTL.

The 100 TB concern for any streaming dedup is unbounded state: one
entry per distinct key, forever. Two bounded answers compose here:
  - `ttl_ms` expires idle keys via the store's native TTL (right when
    duplicates arrive close together — crawl frontier re-visits,
    at-least-once replays);
  - the key itself should be a content HASH (32 B), not the payload —
    the caller groups by `text_hash`, so state size is
    O(distinct keys in TTL window) * 32 B, same discipline as the
    batch-side persisted hash state (operators/dedup.py).

Output mode is Append: each key's FIRST row (in stream arrival order)
is emitted exactly once; later duplicates — same micro-batch or later
ones — emit nothing.

Environment gate: transformWithStateInPandas speaks protobuf to its
per-query state server, so it needs the `protobuf` package at RUNTIME
(pyspark does not declare it as a hard dependency, and this container
ships without it). `tws_available()` reports the capability;
`first_seen_stream` fails fast with a clear message instead of
crashing the driver-side schema worker with a bare ImportError. The
processor's dedup logic is engine-independent and unit-tested directly
(tests/test_sources_streaming.py); the live-engine integration test
runs wherever protobuf is installed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Optional

import pandas as pd

from pyspark.sql import DataFrame

try:  # the stateful-v2 Python API itself is importable without protobuf
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )
except ImportError:  # pragma: no cover - very old pyspark
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = TimerValues = None  # type: ignore[assignment,misc]


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run: the
    engine's state-server protocol needs google.protobuf at runtime."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return StatefulProcessorHandle is not None
    except ImportError:
        return False


class FirstSeenProcessor(StatefulProcessor):
    """Emit the first row per key, suppress all later ones.

    State per key: one long — how many rows were suppressed (useful as
    an operational metric and it keeps the state update monotone, so
    at-least-once redelivery converges). `ttl_ms=None` keeps keys
    forever; set it to bound state by the duplicate-arrival window.
    """

    def __init__(self, ttl_ms: Optional[int] = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._seen = handle.getValueState(
            "seen", "suppressed long", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timer_values: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        prior = self._seen.get()[0] if self._seen.exists() else None
        emitted_before = prior is not None
        n_later = prior or 0
        first = None
        saw_rows = False
        for pdf in rows:
            if len(pdf) == 0:
                continue
            saw_rows = True
            if first is None and not emitted_before:
                first = pdf.head(1)
                n_later += len(pdf) - 1
            else:
                n_later += len(pdf)
        # Only mark the key seen when a row was actually processed: an
        # all-empty-chunks invocation must NOT flip emitted_before, or
        # the key's genuine first row in a later micro-batch would be
        # suppressed forever (review finding).
        if saw_rows or emitted_before:
            self._seen.update((n_later,))
        if first is not None:
            yield first

    def close(self) -> None:
        pass


def first_seen_stream(
    stream: DataFrame,
    key_col: str = "text_hash",
    ttl_ms: Optional[int] = None,
) -> DataFrame:
    """Keep the first row seen per `key_col`; drop every later one.

    `stream` is a streaming DataFrame; output schema == input schema.
    Raises RuntimeError when the runtime lacks protobuf (see module
    docstring) rather than crashing the TWS driver worker.
    """
    if not tws_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' package at "
            "runtime (pyspark's stateful-v2 state server protocol); it is "
            "not installed. Use streaming/dedup_stream.py (foreachBatch) "
            "or stream_dedup_by_key (dropDuplicates) on this runtime."
        )
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=FirstSeenProcessor(ttl_ms),
        outputStructType=stream.schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )
