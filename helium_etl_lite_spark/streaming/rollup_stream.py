"""Streaming continuous aggregate: a file stream of events feeds a
persisted hypertable-style rollup (operators/rollup.py) one micro-batch
at a time.

Per batch (foreachBatch):
1. land the batch's events into the fact table (append — event_id is
   assumed unique per event; a keyed idempotent sink slots in here the
   same way the block follower's does);
2. refresh_rollup() recomputes exactly the touched time buckets from
   the landed facts and replaces them idempotently.

Exactly-once: the checkpoint replays a failed micro-batch; step 2 is a
pure function of the landed facts, so re-running it converges, and a
replayed append in step 1 is the one place needing a keyed sink in
production (dropDuplicates on event_id over the landed table, or the
snapshot sink). Late events need no special casing at all — whatever
bucket they land in gets refreshed.

This is the streaming twin of the `rollup_time_hypertable` batch query:
same aggregate shape, maintained incrementally under arrival order the
batch query never sees.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..operators.rollup import refresh_rollup

EVENT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def start_event_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    bucket_width_sec: int = 3600,
    trigger_once: bool = True,
):
    """Start the stream; returns the StreamingQuery. Facts land under
    `{out_dir}/events`, the rollup under `{out_dir}/rollup`."""
    facts_path = os.path.join(out_dir, "events")
    rollup_path = os.path.join(out_dir, "rollup")

    def process_batch(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch = batch.localCheckpoint(eager=True)
        batch.write.mode("append").parquet(facts_path)
        landed = spark.read.parquet(facts_path)
        refresh_rollup(
            spark,
            landed,
            batch,
            rollup_path,
            time_col="ts",
            keys=("event_type",),
            value_col="value",
            bucket_width_sec=bucket_width_sec,
            distinct_col="user_id",
        )

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .json(events_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="10 seconds")
    return writer.start()
