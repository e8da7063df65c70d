"""Spark 4 Python DataSource implementing the reference's block-feed
shape as a first-class `spark.read.format(...)` source.

The reference ingests blocks by driver-side JSON-RPC point fetches
(src/block_processor.rs:29,58 — one request per block, inherently
serial). `sources/block_source.py` already mirrors that contract; this
module is the DISTRIBUTED evolution: the Python DataSource API
(pyspark.sql.datasource, Spark 4) lets the fetch itself run on
executors, one InputPartition per block file/height range, so ingest
parallelism scales with the cluster instead of the driver's socket.

Batch reader here reads block JSON-lines files (one partition per
file — at scale, one per height range); the same class structure
accepts an RPC-backed `read()` body, which is exactly how a live
blockchain-node follower would fan point fetches across executors.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

BLOCK_SCHEMA = "height long, block_hash string, block_date string, n_txns long"


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class BlocksJsonlReader(DataSourceReader):
    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("blocks_jsonl requires option 'path'")

    def partitions(self):
        # One partition per data file: the planner ships each to an
        # executor; with height-range naming this is where partition
        # pruning on a pushed height predicate would slot in.
        import glob
        import os

        files = sorted(glob.glob(os.path.join(self._path, "*.json")))
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        # Runs ON THE EXECUTOR — this body could equally issue the
        # reference's JSON-RPC point fetches for a height range.
        import json

        with open(partition.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                d = json.loads(line)
                yield (d["height"], d["block_hash"], d["block_date"], d["n_txns"])


class BlocksJsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: the offset is the count of files consumed in
    sorted order — the same monotone cursor discipline as the
    reference's follower_info.height (src/follower.rs:100), expressed
    as a Structured Streaming offset so checkpoint/restart semantics
    come from the engine instead of hand-rolled cursor code."""

    def __init__(self, options):
        self._path = options.get("path")
        if not self._path:
            raise ValueError("blocks_jsonl requires option 'path'")

    def _files(self):
        import glob
        import os

        return sorted(glob.glob(os.path.join(self._path, "*.json")))

    def initialOffset(self):
        return {"n_files": 0}

    def read(self, start):
        import json

        files = self._files()
        done = start["n_files"]
        rows = []
        for path in files[done:]:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        d = json.loads(line)
                        rows.append(
                            (d["height"], d["block_hash"], d["block_date"], d["n_txns"])
                        )
        return iter(rows), {"n_files": len(files)}

    def readBetweenOffsets(self, start, end):
        # deterministic replay for recovery: same file-count window
        import json

        files = self._files()[start["n_files"] : end["n_files"]]
        rows = []
        for path in files:
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        d = json.loads(line)
                        rows.append(
                            (d["height"], d["block_hash"], d["block_date"], d["n_txns"])
                        )
        return iter(rows)

    def commit(self, end):
        pass


class BlocksJsonlDataSource(DataSource):
    @classmethod
    def name(cls):
        return "blocks_jsonl"

    def schema(self):
        return BLOCK_SCHEMA

    def reader(self, schema):
        return BlocksJsonlReader(self.options)

    def simpleStreamReader(self, schema):
        return BlocksJsonlStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(BlocksJsonlDataSource)
