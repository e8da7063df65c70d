"""Delta-chain read-amplification datapoint (r11 verdict item 4).

The write side of the versioned stores is pinned O(batch)
(tests/test_sources_streaming.py: delta bytes < base/5); this measures
the READ side — compose_version wall-clock as the chain grows to the
compaction cap, and the recovery after compaction re-bases — so the
chain-cap choice (streaming/mirror.py COMPACT_EVERY=8) carries a
number, not just an argument.

Usage:  python3 tools/bench_delta_chain.py [base_rows] [batch_rows]
Prints one line per committed version: chain length, composed-read
wall (min of 3), row count; then a summary ratio (read at cap /
read of a fresh base).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from helium_etl_lite_spark.session import get_spark  # noqa: E402
from helium_etl_lite_spark.streaming import mirror  # noqa: E402


def _run_lane(spark, tmp, lane, base_rows, batch_rows, cap):
    """One measured chain: lane='insert' emits insert-only batches
    (the writer-stamped has_deletes=False fast path — composes as
    unions), lane='mixed' adds 10% deletes of prior rows (the
    exceptAll fold path)."""
    mdir = os.path.join(tmp, f"m_{lane}")
    os.makedirs(mdir)

    def feed(bid, n):
        ins = spark.range(n).select(
            (F.col("id") + bid * 100_000_000).alias("block"),
            (F.col("id") * 1.5).alias("v"),
            F.lit("insert").alias("_change_type"),
        )
        if lane == "insert" or bid == 1:
            return ins
        # delete 10% of the PREVIOUS batch's rows (re-derivable rows,
        # so the delete images byte-match the mirror)
        prev = bid - 1
        dels = spark.range(n // 10).select(
            (F.col("id") + prev * 100_000_000).alias("block"),
            (F.col("id") * 1.5).alias("v"),
            F.lit("delete").alias("_change_type"),
        )
        return ins.unionByName(dels)

    results = []
    # keep wide enough that no chain is pruned mid-measurement
    for bid in range(1, cap + 2):
        n = base_rows if bid == 1 else batch_rows
        assert mirror.apply_changes_batch(feed(bid, n), bid, mdir, keep=cap + 2)
        chain = len(mirror.chain_of(mdir, bid))
        runs = []
        cnt = 0
        for _ in range(3):
            t0 = time.perf_counter()
            cnt = mirror.read_mirror(spark, mdir).count()
            runs.append(time.perf_counter() - t0)
        results.append((bid, chain, min(runs), cnt))
        kind = mirror.manifest_of(mdir, bid)["kind"]
        print(
            f"{lane:<6} v={bid:<3} kind={kind:<5} chain={chain} "
            f"read_min={min(runs):.3f}s rows={cnt}"
        )
    base_read = results[0][2]
    at_cap = max(r[2] for r in results if r[1] == cap)
    post = results[-1][2]
    print(
        f"# {lane}: read-at-cap/base = {at_cap / base_read:.2f}x, "
        f"post-compaction/base = {post / base_read:.2f}x "
        f"(cap={cap}, base={base_rows} rows, batch={batch_rows} rows)"
    )


def main():
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("bench_delta_chain")
    cap = mirror.COMPACT_EVERY
    try:
        with tempfile.TemporaryDirectory() as tmp:
            for lane in ("insert", "mixed"):
                _run_lane(spark, tmp, lane, base_rows, batch_rows, cap)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
