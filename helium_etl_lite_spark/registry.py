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
    # ------------------------------------------------------------------
    # r10 rotation (r9 verdict directive 2): the ENTIRE 34-query
    # r4-vintage cohort enters the window — after this round no driver
    # verdict on record is older than r5.  New r10 registrations are
    # capped (<=12) and take the remaining slots ahead of the oldest
    # r5 re-confirms.
    # (1) all 34 r4-vintage re-confirms:
    "agg_approx_count_distinct",      # r4 (rows-only by design; re-run)
    "agg_argminmax",                  # r4
    "agg_avg_stddev_var",             # r4
    "agg_collect_list_set",           # r4
    "agg_corr_covar",                 # r4
    "agg_cube",                       # r4
    "agg_grouping_sets",              # r4
    "agg_having",                     # r4
    "agg_mode_deterministic",         # r4
    "agg_partial_final",              # r4
    "agg_percentile",                 # r4
    "agg_percentile_approx",          # r4
    "agg_pivot",                      # r4
    "agg_rollup",                     # r4
    "agg_string_listagg",             # r4
    "anomaly_zscore",                 # r4
    "dedup_cluster_components",       # r4
    "dedup_ngram_jaccard",            # r4
    "exists_in_block_range",          # r4
    "join_multiway_star",             # r4 (the flagship)
    "json_variant_extract",           # r4
    "pipeline_corpus_curation",       # r4
    "rollup_time_hypertable",         # r4
    "scd2_intervals",                 # r4
    "sessionize_gap30",               # r4
    "sink_partitioned_prune",         # r4
    "source_orc_roundtrip",           # r4
    "subquery_in_exists",             # r4
    "subquery_scalar",                # r4
    "text_contamination_ngram",       # r4
    "unpivot_melt",                   # r4
    "vec_dedup_cosine",               # r4 (exact all-pairs by contract)
    "vec_knn_cosine",                 # r4
    "win_cume_dist_nth",              # r4
    # (2) NEW r10 registrations (first driver contact; each slot here
    #     displaces an r5 re-confirm to r11):
    "text_quality_classifier_train",  # hashed logistic-regression trainer
    "text_tokenize_unigram_lm",       # Kudo-2018 unigram-LM tokenizer
    "sink_snapshot_changes_updates",  # CDC update_pre/postimage pairing
    "dedup_cluster_components_star",  # Kiveris-2014 large/small-star CC
    "multimodal_audio_spectrogram",   # integer-DFT band energies (WAV)
    "sample_token_budget_unigram",    # unigram-LM-priced token budget
    # (2b) r10 implementation change — the standard min-theta AnotB
    #      rewrite (r9 ADVICE item 3) needs a fresh verdict:
    "agg_kmv_theta_anotb_portable",   # theta=min(a,b) difference est.
    "stream_cdc_mirror_keyed",        # upsert-by-key CDC consumer
    "text_tokenize_unigram_portable", # integer-cost Viterbi exact twin
    "text_quality_classifier_eval",   # held-out confusion/accuracy
    "multimodal_audio_fingerprint",   # Haitsma-Kalker sign-delta bits
    "multimodal_audio_neardup",       # banded hamming == all-pairs proof
    # (3) oldest r5 re-confirms fill the remaining slots (rest of the
    #     r5 cohort — the scalar-funcs/windows tail — queues for r11):
    "filter_in_set",                  # r5
    "filter_null_semantics",          # r5
    "join_inner_equi",                # r5
    "join_sortmerge_large",           # r5
    # (r5 vintages still queued for the r11 window: array_funcs,
    #  case_when_dispatch, cast_try_cast, date_funcs, filter_like_regex,
    #  funnel_conversion,
    #  hash_funcs, hash_funcs_xxhash64, join_broadcast_dim, join_left_*,
    #  join_range_binned,
    #  join_asof_event_order, join_skew_salted, json_funcs, map_funcs,
    #  multimodal_decode_stub,
    #  pack_sequence_bins, retention_cohort, sample_balance_buckets,
    #  sample_token_budget, str_funcs, text_dedup_exact,
    #  text_fingerprint_rolling,
    #  text_lang_id_ngram, text_perplexity_unigram, text_quality_score,
    #  text_token_count_regex, text_tokenize_stats, ts_gapfill_locf,
    #  ts_interpolate_linear, ts_resample_ohlc, vec_ann_lsh,
    #  win_first_last_value, win_lag_lead, win_rank_dense_rank,
    #  win_row_number_topk_per_group, win_running_sum_frame — until then their evidence is the
    #  full-registry DuckDB sweep, tests/test_queries_oracle.py,
    #  run on HEAD each round)
]

# The 50-query window boundary is position-sensitive; a duplicate entry
# silently shifts every later query out of the window (ADVICE r2), and
# an entry beyond position 50 silently falls outside the driver's exact
# gate (ADVICE r6) — both must fail loudly at import.
assert len(set(FRONT_OF_WINDOW)) == len(FRONT_OF_WINDOW), "duplicate in FRONT_OF_WINDOW"
assert len(FRONT_OF_WINDOW) <= 50, (
    f"FRONT_OF_WINDOW holds {len(FRONT_OF_WINDOW)} names; the driver "
    "verifies only the first 50 — trim the list or rotate entries out"
)


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
        reports,
        scalar_funcs,
        scans,
        sorts_sets,
        streaming_batch,
        timeseries,
        udfs,
        windows,
    )

    # a misspelled window entry would otherwise be skipped silently,
    # quietly dropping the intended query out of the driver's exact
    # gate — same fail-loud contract as the size/dup asserts above
    missing = [n for n in FRONT_OF_WINDOW if n not in QUERIES]
    assert not missing, f"FRONT_OF_WINDOW names not in registry: {missing}"
    ordered: dict[str, QueryFn] = {}
    for name in FRONT_OF_WINDOW:
        ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
