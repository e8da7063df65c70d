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

Variance discipline (r4 verdict item 1): BENCH totals swung ±30%
across rounds with unchanged code because best-of-2 doesn't reach JVM
steady state — whole-stage-codegen classes only hit C2 tier after
several executions (measured: join_multiway_star 3.47 → 1.90 → 1.85 →
1.32 → 1.26 → 1.21 s over six runs). Each query now runs N_RUNS=5
times; the reported number is the min (the reproducible steady-state
cost a resident engine pays), and the JSON carries every run plus a
spread so a real regression is distinguishable from host noise:
spread_pct = (median - min) / min — high spread means the host was
loaded and the min is the trustworthy number.

`value` stays the sum over the SAME 12-query headline set benched
since r3 (named in "headline") so round-over-round totals compare;
the r4 control-plane operators (pack_sequence_bins, ts_gapfill_locf)
are tracked in "queries" / "extended_total" without breaking the
series.
"""

from __future__ import annotations

import json
import os
import statistics
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

# Tracked but excluded from `value` to keep the headline series
# comparable across rounds.
EXTENDED = [
    "pack_sequence_bins",
    "ts_gapfill_locf",
]

N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))


def _bench_one(spark, sf_dir, name):
    fn = registry.QUERIES[name]
    runs = []
    n = 0
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        runs.append(time.perf_counter() - t0)
    best = min(runs)
    med = statistics.median(runs)
    spread = round(100.0 * (med - best) / best, 1) if best > 0 else 0.0
    print(
        f"# {name}: {n} rows; min {best:.3f}s median {med:.3f}s "
        f"spread {spread}% (runs: {', '.join(f'{r:.3f}' for r in runs)})",
        file=sys.stderr,
    )
    return runs, best, spread


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark("bench")
    try:
        load0 = os.getloadavg()
        # warm the JVM + parquet footers of every input so per-query
        # times measure the query, not session startup / first-touch IO.
        for table in (
            "region nation customer supplier part orders lineitem "
            "events documents embeddings"
        ).split():
            spark.read.parquet(f"{sf_dir}/{table}.parquet").count()

        timings: dict[str, float] = {}
        all_runs: dict[str, list[float]] = {}
        spreads: dict[str, float] = {}
        for name in HEADLINE + EXTENDED:
            runs, best, spread = _bench_one(spark, sf_dir, name)
            timings[name] = round(best, 3)
            all_runs[name] = [round(r, 3) for r in runs]
            spreads[name] = spread

        sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(
            json.dumps(
                {
                    "metric": "headline_queries_total",
                    "value": round(sum(timings[q] for q in HEADLINE), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "headline": HEADLINE,
                    "extended_total": round(
                        sum(timings[q] for q in EXTENDED), 3
                    ),
                    "n_runs": N_RUNS,
                    "runs": all_runs,
                    "spread_pct": spreads,
                    "loadavg_start": [round(x, 2) for x in load0],
                    "loadavg_end": [
                        round(x, 2) for x in os.getloadavg()
                    ],
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
