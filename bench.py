"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: one per plan shape that matters at scale — scan+filter
pushdown, the flagship star join, large sort-merge join, hash agg,
window top-k, as-of join, streaming-shaped session window, minhash
dedup, brute-force knn, the blocked exact cosine self-join, and the
one-plan corpus curation pipeline. Each query is executed with a
count-style terminal action so results materialize fully but don't
serialize to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helium_etl_lite_spark import registry
from helium_etl_lite_spark.session import get_spark

HEADLINE = [
    "scan_predicate_pushdown",
    "join_multiway_star",
    "join_sortmerge_large",
    "agg_groupby_hash",
    "agg_count_distinct",
    "win_row_number_topk_per_group",
    "join_asof_event_order",
    "stream_session_window",
    "text_dedup_minhash",
    "vec_knn_cosine",
    "vec_dedup_cosine",
    "pipeline_corpus_curation",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("bench")
    try:
        # warm the JVM + parquet footers of every input so per-query
        # times measure the query, not session startup / first-touch IO.
        for table in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            spark.read.parquet(f"{sf_dir}/{table}.parquet").count()

        # best-of-2 per query (standard steady-state practice): the first
        # execution of a shape pays one-time codegen JIT that a resident
        # engine never re-pays; the min is the reproducible number.
        timings: dict[str, float] = {}
        for name in HEADLINE:
            fn = registry.QUERIES[name]
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 3)
            print(f"# {name}: {n} rows in {timings[name]:.3f}s (runs: "
                  f"{', '.join(f'{r:.3f}' for r in runs)})", file=sys.stderr)

        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
