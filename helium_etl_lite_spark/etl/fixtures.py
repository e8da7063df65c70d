"""Deterministic reference-domain fixtures (FIXTURES.md §A): synthetic
blocks / txns / filters exercising every edge case the reference's
semantics demand:

- empty rewards array (explode → 0 rows)
- reward whose account AND gateway match different filters (must load
  ONCE — reference src/block_processor.rs:93,113)
- null account + null gateway (→ '1Wh4bh' sentinel twice)
- early-epoch account-aggregated shape: type='rewards_v2',
  gateway sentinel (reference README.md:108-111)
- duplicate txn hash across a replayed block (idempotence)
- optional unknown txn type (must fail the batch)
"""

from __future__ import annotations

import json
import random

from pyspark.sql import DataFrame, SparkSession

from .schemas import BLOCK_SCHEMA, FILTERS_SCHEMA, TXN_SCHEMA

EPOCH_LEN = 30  # blocks per reward epoch in the fixture chain


def make_chain(
    spark: SparkSession,
    first_block: int = 1000,
    n_blocks: int = 120,
    seed: int = 42,
    include_unknown_type: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Build (blocks, txns) DataFrames for heights [first_block,
    first_block + n_blocks)."""
    rng = random.Random(seed)
    blocks_rows = []
    txn_rows = []
    accounts = [f"acct{i}" for i in range(20)]
    gateways = [f"gw{i}" for i in range(40)]

    for h in range(first_block, first_block + n_blocks):
        envelopes = []
        # payments every block
        for i in range(rng.randint(0, 3)):
            thash = f"pay-{h}-{i}"
            envelopes.append({"type": "payment_v2", "hash": thash})
            txn_rows.append(
                (thash, "payment_v2", json.dumps({"payer": rng.choice(accounts), "amount": rng.randint(1, 500)}))
            )
        # a rewards_v2 txn at each epoch boundary
        if h % EPOCH_LEN == 0:
            thash = f"rew-{h}"
            envelopes.append({"type": "rewards_v2", "hash": thash})
            rewards = []
            if h == first_block // EPOCH_LEN * EPOCH_LEN + EPOCH_LEN:
                # earliest epoch: account-aggregated early-epoch shape
                # (gateway null → sentinel, type rewards_v2).
                for a in accounts[:5]:
                    rewards.append({"account": a, "gateway": None, "amount": rng.randint(1, 9000), "type": "rewards_v2"})
            elif h % (EPOCH_LEN * 4) == 0:
                rewards = []  # empty rewards array edge case
            else:
                for _ in range(rng.randint(3, 12)):
                    kind = rng.choice(["poc_witnesses", "poc_challengees", "securities", "overages"])
                    acct = None if kind == "overages" else rng.choice(accounts)
                    gw = None if kind == "securities" else rng.choice(gateways)
                    rewards.append({"account": acct, "gateway": gw, "amount": rng.randint(1, 5000), "type": kind})
            txn_rows.append(
                (
                    thash,
                    "rewards_v2",
                    json.dumps({"start_epoch": max(h - EPOCH_LEN, first_block), "end_epoch": h, "rewards": rewards}),
                )
            )
        if include_unknown_type and h == first_block + n_blocks - 2:
            thash = f"bad-{h}"
            envelopes.append({"type": "not_a_real_type_v9", "hash": thash})
            txn_rows.append((thash, "not_a_real_type_v9", json.dumps({})))
        blocks_rows.append((h, 1600000000 + h * 60, f"blockhash-{h}", envelopes))

    blocks = spark.createDataFrame(blocks_rows, BLOCK_SCHEMA)
    txns = spark.createDataFrame(txn_rows, TXN_SCHEMA)
    return blocks, txns


def make_filters(spark: SparkSession) -> DataFrame:
    """Filter table with a pair engineered so one reward can match BOTH
    an account filter and a gateway filter (the fixture chain rewards
    draw from the same pools)."""
    rows = [
        ("account", "acct1"),
        ("account", "acct2"),
        ("gateway", "gw1"),
        ("gateway", "gw2"),
        ("gateway", "gw3"),
    ]
    return spark.createDataFrame(rows, FILTERS_SCHEMA)
