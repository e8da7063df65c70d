"""Build a scaled-up replica of a driver testdata directory for the
bench's scaling lane (VERDICT r5 item 2: turn the 100 TB plan-shape
story into a measured sf0.1 -> sf1 curve).

The driver ships sf{0.001,0.01,0.1} only and its generator is not
available, so the sf1 lane derives its input from the LARGEST driver
dataset by replication: each fact table is unioned R times with every
primary/foreign key shifted by `replica * STRIDE`, so each replica is a
self-consistent star (joins match within a replica, never across) and
every join/agg/window grows exactly linearly in R. `region`/`nation`
stay 1x (TPC-H dims that do not scale with sf). Text/embedding payloads
repeat verbatim across replicas — so dedup operators see realistic 10x
duplicate clusters rather than synthetic novel text, which is the
honest workload for a dedup scaling lane.

This is a measurement harness, not test data: correctness gates keep
running on the driver's own parquet unmodified.

Usage: python tools/make_scaled_sf.py [src_dir] [out_dir] [replicas]
Library: ensure_scaled(spark, src, out, replicas) -> out (cached:
a marker file records (src, replicas); rebuilds only on mismatch).
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import pyspark.sql.functions as F

# Large enough that shifted keys never collide across replicas (max
# o_orderkey at sf0.1 is ~6e5), small enough that 10 replicas stay
# far inside int64.
STRIDE = 1 << 33

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Key columns shifted by replica*STRIDE; tables absent here are copied
# through once (non-scaling dims).
SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

MARKER = "_SCALED_MARKER.json"

# r15 measurement-bug fix (guide §6, disclosed in OPTIMIZATION_r15.md):
# the generator previously inherited the driver files' layout — ONE
# output file with ONE row group per table (the crossJoin stage has a
# single scan split), so every x10 scan planned exactly ONE task and
# the lane's "scaling" numbers serialized all row-local work on one
# core. Real 10x data arrives as many splits; the scaled fact tables
# are now written as LAYOUT_FILES files so scans parallelize. Layout
# version rides the marker, so existing v1 caches rebuild.
LAYOUT_FILES = 32
LAYOUT_VERSION = 2


def ensure_scaled(spark, src: str, out: str, replicas: int) -> str:
    """Materialize `src` replicated `replicas` times under `out`;
    no-op when a marker shows the same (src, replicas) already built."""
    want = {
        "src": os.path.abspath(src),
        "replicas": replicas,
        "layout": LAYOUT_VERSION,
    }
    marker = os.path.join(out, MARKER)
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == want:
                    return out
        except (OSError, json.JSONDecodeError):
            pass
        shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    reps = spark.range(replicas).select(F.col("id").alias("__rep"))
    for table in TABLES:
        df = spark.read.parquet(os.path.join(src, f"{table}.parquet"))
        keys = SHIFT_KEYS.get(table)
        if keys:
            scaled = df.crossJoin(reps)
            for k in keys:
                scaled = scaled.withColumn(
                    k, (F.col(k) + F.col("__rep") * F.lit(STRIDE)).cast("long")
                )
            scaled = scaled.drop("__rep").repartition(LAYOUT_FILES)
        else:
            scaled = df
        scaled.write.mode("overwrite").parquet(
            os.path.join(out, f"{table}.parquet")
        )
    with open(marker, "w") as f:
        json.dump(want, f)
    return out


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from helium_etl_lite_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaled", "sf1",
    )
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make-scaled-sf")
    try:
        ensure_scaled(spark, src, out, replicas)
        print(out)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
