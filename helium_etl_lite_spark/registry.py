"""Query/oracle registry backing the driver contract (__spark_entry__.py).

Every operator from SURVEY.md §2.4 registers here as
  - a Spark callable  (spark, sf_dir) -> DataFrame
  - optionally a DuckDB oracle SQL string (exact hash-check); queries
    without an oracle get the driver's weaker rows-only check.

Discipline (SURVEY §7 "oracle hash-matching"): alias every computed
column identically on both sides; keep floating-point aggregates either
exactly reproducible (sums of integral doubles, row-level arithmetic)
or rounded on BOTH sides; never rely on row order.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle`` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver's per-round correctness gate checks the first 50 queries in
# registration order (round 1 covered the first 50: aggregates/extras/
# filters/joins + llm_ops head — CORRECTNESS_r01.json).  To accumulate
# hard-signal coverage across rounds, queries not yet driver-verified
# (or changed since their last verdict) are pinned to the FRONT of the
# registry here; everything else keeps module registration order behind
# them.  Update this list each round from CORRECTNESS_r{N}.json.
FRONT_OF_WINDOW: list[str] = [
    # new in r4 (exact oracles, verified by the local replica) — every
    # pre-r4 query already holds a green driver verdict (r1∪r2∪r3), so
    # the window leads with the 13 new queries
    "ts_gapfill_locf",
    "ts_interpolate_linear",
    "scd2_intervals",
    "anomaly_zscore",
    "retention_cohort",
    "funnel_conversion",
    "text_contamination_ngram",
    "pack_sequence_bins",
    "agg_string_listagg",
    "agg_mode_deterministic",
    "source_orc_roundtrip",
    "sink_partitioned_prune",
    "sink_compact_files",
    # ---- everything below re-confirms prior driver greens (window is
    # ---- 50; remaining slots fill in module registration order, but
    # ---- pin the heaviest-value / perf-touched re-confirms first)
    "vec_knn_cosine",
    "vec_dedup_cosine",
    "text_dedup_minhash",
    "join_multiway_star",
    "pipeline_corpus_curation",
    "sessionize_gap30",
    "dedup_ngram_jaccard",
    "dedup_cluster_components",
    "sample_balance_buckets",
    "rollup_time_hypertable",
    "text_tfidf",
    "sink_roundtrip_parquet",
]

# The 50-query window boundary is position-sensitive; a duplicate entry
# silently shifts every later query out of the window (ADVICE r2).
assert len(set(FRONT_OF_WINDOW)) == len(FRONT_OF_WINDOW), "duplicate in FRONT_OF_WINDOW"


def load_all() -> None:
    """Import every query module so registrations run, then order the
    registry so not-yet-driver-verified queries land inside the gate's
    50-query window (see FRONT_OF_WINDOW)."""
    from .queries import (  # noqa: F401
        aggregates,
        curation,
        extras,
        filters,
        joins,
        llm_ops,
        scalar_funcs,
        scans,
        sorts_sets,
        streaming_batch,
        timeseries,
        udfs,
        windows,
    )

    ordered: dict[str, QueryFn] = {}
    for name in FRONT_OF_WINDOW:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
