"""Custom stateful streaming operator: per-key running aggregates via
applyInPandasWithState (SURVEY §2.4 H stream_stateful_running_count's
live twin; the reference's only state is its cursor row — this is the
generalization a real-time serving layer needs, e.g. running reward
totals per gateway).

State is a (count, total) pair per key, updated per micro-batch;
timeouts evict idle keys so state stays bounded — the 100 TB concern
for any stateful operator is unbounded state growth, and
GroupStateTimeout is the built-in answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count long, total double"
OUTPUT_SCHEMA = "key long, count long, total double"


def running_totals_stream(events_stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """events_stream: streaming DataFrame with (key_col, value).

    The update function is defined as a closure so cloudpickle ships it
    by VALUE to Python workers — a module-level function would be
    pickled by reference and require this package importable on every
    worker's PYTHONPATH.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        count, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, total))
        state.setTimeoutDuration(3_600_000)  # evict after 1h idle
        yield pd.DataFrame({"key": [key[0]], "count": [count], "total": [total]})

    return (
        events_stream.select(events_stream[key_col].alias("key"), "value")
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
