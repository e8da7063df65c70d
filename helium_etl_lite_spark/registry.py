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
    # r5 rotation (r4 verdict item 4): no query's latest verdict may
    # predate the last edit of its module.
    # (a) code/plan changed THIS round — must re-verify first:
    "retention_cohort",      # broadcast hint removed (r5)
    "funnel_conversion",     # broadcast hints removed (r5)
    "ts_interpolate_linear",  # comment-only edit, re-confirm anyway
    "ts_gapfill_locf",        # plan claims now test-pinned
    # new queries added in r5 register here as they land:
    "text_dedup_minhash_incremental",
    "ts_resample_ohlc",
    "sample_token_budget",
    "vec_dedup_semantic",
    "source_schema_evolution",
    "sample_reservoir_per_group",
    # operators rewritten in r5 — their consumer queries re-verify
    # (two-level prefix_sum/ntile in scale.py; row-local signatures +
    # multi-table LSH in dedup.py/knn.py):
    "pack_sequence_bins",
    "sample_balance_buckets",
    "text_dedup_minhash",
    "text_tfidf",              # vocab-join hint dropped r5
    "text_perplexity_unigram",  # vocab-join hint dropped r5
    # (vec_ann_lsh re-verifies via group (b) below)
    # (b) modules edited after these queries' last driver verdict
    # (scalar_funcs + windows oracle casts landed r3, verdicts are r2;
    # llm_ops was reorganized r3, these verdicts are r1/r2):
    "str_funcs",
    "date_funcs",
    "array_funcs",
    "map_funcs",
    "json_funcs",
    "hash_funcs",
    "hash_funcs_xxhash64",
    "cast_try_cast",
    "win_row_number_topk_per_group",
    "win_rank_dense_rank",
    "win_lag_lead",
    "win_running_sum_frame",
    "win_first_last_value",
    "text_tokenize_stats",
    "text_dedup_exact",
    "text_dedup_simhash",
    "vec_ann_lsh",
    "text_quality_score",
    "text_token_count_regex",
    "text_fingerprint_rolling",
    "text_lang_id_ngram",
    "multimodal_decode_stub",
    # (c) oldest-first re-confirms — the r1 joins/filters block:
    "filter_in_set",
    "filter_null_semantics",
    "filter_like_regex",
    "case_when_dispatch",
    "join_inner_equi",
    "join_broadcast_dim",
    "join_sortmerge_large",
    "join_left_right_outer",
    "join_left_semi",
    "join_left_anti",
    "join_asof_event_order",
    "join_skew_salted",
    "join_range_binned",
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
