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
    # changed this round → needs a fresh verdict
    "agg_percentile_approx",  # r01 ERR (array column); now scalar p50/p95/p99
    "vec_dedup_cosine",  # rewritten: blocked equi-join all-pairs
    "sample_balance_buckets",  # rewritten: distributed decile boundaries
    "multimodal_decode_stub",  # now backed by a real PPM/BMP decoder
    "join_multiway_star",  # rewritten: manual partial-agg pushdown
    "dedup_ngram_jaccard",  # rewritten: incidence-matrix BLAS kernel
    "dedup_cluster_components",  # pair-gen switched to the BLAS kernel
    # never driver-verified (r01 graded "untested"): §2.4.A scans
    "scan_parquet",
    "scan_projection_pushdown",
    "scan_predicate_pushdown",
    "sink_roundtrip_parquet",
    "source_json_lines",
    # §2.4.E windows
    "win_row_number_topk_per_group",
    "win_rank_dense_rank",
    "win_lag_lead",
    "win_running_sum_frame",
    "win_sliding_avg_range_frame",
    "win_first_last_value",
    # §2.4.F sorts/limits/set ops
    "sort_multi_key",
    "limit_topk",
    "distinct_dedup",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    # §2.4.G scalar functions
    "str_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "map_funcs",
    "json_funcs",
    "hash_funcs",
    "hash_funcs_xxhash64",
    "cast_try_cast",
    # §2.4.H streaming-shaped
    "stream_tumbling_window_agg",
    "stream_sliding_window_agg",
    "stream_session_window",
    "stream_watermark_late_drop",
    "stream_dedup_by_key",
    "stream_cursor_incremental",
    "stream_stateful_running_count",
    # §2.4.I UDF surface
    "udf_scalar_python",
    "udf_pandas_vectorized",
    "udaf_grouped_agg",
    "udtf_flatten",
    # unchecked llm_ops tail (exact-oracle rows first — strongest signal)
    "text_lang_topk",
    "text_quality_score",
    "text_token_count_regex",
    "text_fingerprint_rolling",
    "text_lang_id_ngram",
    # ---- 50-query window boundary falls here; the rest queue for r3 ----
    "text_tfidf",
    "sessionize_gap30",
    "pipeline_corpus_curation",
    "text_clean_normalize",
    "text_vocab_prune",
    "text_fuzzy_levenshtein",
    "dedup_cluster_components",
    "multimodal_feature_extract",
    "multimodal_resize",
    "multimodal_frame_sample",
    "vec_ann_ivf",
    "vec_cluster_assign",
    "vec_kmeans",
    "sample_split_train_test",
    "text_repetition_stats",  # new in r2
    "text_pii_scrub",  # new in r2
    "source_csv_roundtrip",  # new in r2
    "stream_stream_interval_join",  # new in r2
]


def load_all() -> None:
    """Import every query module so registrations run, then order the
    registry so not-yet-driver-verified queries land inside the gate's
    50-query window (see FRONT_OF_WINDOW)."""
    from .queries import (  # noqa: F401
        aggregates,
        extras,
        filters,
        joins,
        llm_ops,
        scalar_funcs,
        scans,
        sorts_sets,
        streaming_batch,
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
