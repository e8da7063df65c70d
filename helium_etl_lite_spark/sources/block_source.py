"""Block/transaction sources (SURVEY §2.1 E1-E3).

The reference pulls blocks over JSON-RPC: a tip probe
(src/follower.rs:76), a raw-block fetch per height
(src/block_processor.rs:29) and an N+1 typed-txn fetch per hash
(:58, :130). In Spark the source's job is to expose the same data as
DataFrames so the rest of the pipeline is declarative; three shapes:

- ParquetBlockSource: columnar tables (the at-scale path; heights
  partition-prune).
- JsonBlockSource: directory of BlockRaw JSON documents (the wire-format
  analog; also what the streaming twin reads).
- RpcBlockSource: driver-side point-fetch loop over an RpcClient
  protocol — the literal reference topology, for near-tip following
  where only a handful of new blocks exist per tick. Batch-fetches the
  (cursor, tip] range then parallelizes it as a DataFrame, replacing
  the reference's per-txn round trips with one createDataFrame.

RpcClient is a protocol with two implementations: HttpRpcClient (a
stdlib-urllib JSON-RPC 2.0 client speaking the blockchain-node API the
reference's helium-jsonrpc crate wraps) and FakeRpcClient (in-memory
test double; also what the HTTP client's tests serve from behind a
local http.server stub).
"""

from __future__ import annotations

import json as _json
import urllib.request
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession

from ..etl.schemas import BLOCK_SCHEMA, TXN_SCHEMA


class BlockSource(Protocol):
    def tip(self) -> int: ...
    def blocks(self) -> DataFrame: ...
    def txns(self) -> DataFrame: ...


class ParquetBlockSource:
    def __init__(self, spark: SparkSession, blocks_path: str, txns_path: str):
        self.spark = spark
        self.blocks_path = blocks_path
        self.txns_path = txns_path

    def tip(self) -> int:
        from pyspark.sql import functions as F

        return self.blocks().agg(F.max("height")).collect()[0][0]

    def blocks(self) -> DataFrame:
        return self.spark.read.schema(BLOCK_SCHEMA).parquet(self.blocks_path)

    def txns(self) -> DataFrame:
        return self.spark.read.schema(TXN_SCHEMA).parquet(self.txns_path)


class JsonBlockSource:
    """BlockRaw documents as JSON-lines files — the wire format landed
    on storage. Explicit schema: no inference pass over 100 TB."""

    def __init__(self, spark: SparkSession, blocks_dir: str, txns_dir: str):
        self.spark = spark
        self.blocks_dir = blocks_dir
        self.txns_dir = txns_dir

    def tip(self) -> int:
        from pyspark.sql import functions as F

        return self.blocks().agg(F.max("height")).collect()[0][0]

    def blocks(self) -> DataFrame:
        return self.spark.read.schema(BLOCK_SCHEMA).json(self.blocks_dir)

    def txns(self) -> DataFrame:
        return self.spark.read.schema(TXN_SCHEMA).json(self.txns_dir)


class RpcClient(Protocol):
    """The three calls the reference makes (helium-jsonrpc surface)."""

    def height(self) -> int: ...                       # blocks::height
    def get_block_raw(self, height: int) -> dict: ...  # blocks::get_raw
    def get_transaction(self, hash: str) -> dict: ...  # transactions::get


class RpcError(RuntimeError):
    """JSON-RPC failure (transport or error response) — the Jrpc arm of
    the reference's error enum (src/error.rs:5-15)."""


class HttpRpcClient:
    """JSON-RPC 2.0 over HTTP with stdlib urllib only — the production
    implementation of RpcClient (reference src/follower.rs:26 builds the
    same client from settings.node_addr).

    Method names follow the public blockchain-node API surface the
    helium-jsonrpc crate calls: block_height / block_get /
    transaction_get. Results are accepted both bare and wrapped
    ({"height": N} vs N) since node versions differ.
    """

    def __init__(self, node_addr: str, timeout: float = 30.0):
        self.url = node_addr if "://" in node_addr else f"http://{node_addr}"
        self.timeout = timeout
        self._next_id = 0

    def _call(self, method: str, params: dict | None = None):
        self._next_id += 1
        body: dict = {"jsonrpc": "2.0", "id": str(self._next_id), "method": method}
        if params is not None:
            body["params"] = params
        req = urllib.request.Request(
            self.url,
            data=_json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                payload = _json.loads(resp.read().decode("utf-8"))
        except OSError as e:  # connection refused, timeout, HTTP error…
            raise RpcError(f"{method}: transport failure: {e}") from e
        if payload.get("error"):
            raise RpcError(f"{method}: {payload['error']}")
        if "result" not in payload:
            raise RpcError(f"{method}: malformed response (no result)")
        return payload["result"]

    def height(self) -> int:
        result = self._call("block_height")
        return int(result["height"] if isinstance(result, dict) else result)

    def get_block_raw(self, height: int) -> dict:
        return self._call("block_get", {"height": height})

    def get_transaction(self, hash: str) -> dict:
        return self._call("transaction_get", {"hash": hash})


class FakeRpcClient:
    """In-memory RpcClient test double (no network in this container)."""

    def __init__(self, blocks_by_height: dict[int, dict], txns_by_hash: dict[str, dict]):
        self._blocks = blocks_by_height
        self._txns = txns_by_hash

    def height(self) -> int:
        return max(self._blocks)

    def get_block_raw(self, height: int) -> dict:
        return self._blocks[height]

    def get_transaction(self, hash: str) -> dict:
        return self._txns[hash]


class RpcBlockSource:
    """Near-tip follower source: fetch the lagging range via point RPCs
    (driver-side, tiny), then hand the pipeline DataFrames. One
    createDataFrame replaces the reference's per-row INSERT path; the
    N+1 txn fetches collapse to one pass over the hashes in range."""

    def __init__(self, spark: SparkSession, client: RpcClient, lo: int, hi: int):
        self.spark = spark
        self.client = client
        self.lo = lo
        self.hi = hi

    def tip(self) -> int:
        return self.client.height()

    def blocks(self) -> DataFrame:
        rows = []
        for h in range(self.lo, self.hi + 1):
            b = self.client.get_block_raw(h)
            rows.append(
                (
                    b["height"],
                    b["time"],
                    b["hash"],
                    [{"type": t["type"], "hash": t["hash"]} for t in b["transactions"]],
                )
            )
        return self.spark.createDataFrame(rows, BLOCK_SCHEMA)

    def txns(self) -> DataFrame:
        import json as _json

        rows = []
        for h in range(self.lo, self.hi + 1):
            for t in self.client.get_block_raw(h)["transactions"]:
                payload = self.client.get_transaction(t["hash"])
                rows.append((t["hash"], t["type"], _json.dumps(payload)))
        return self.spark.createDataFrame(rows, TXN_SCHEMA)
