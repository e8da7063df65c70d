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
    # r11 rotation (r10 verdict directive 1): the ENTIRE 39-query
    # r5-vintage cohort enters the window — after this round no driver
    # verdict on record is older than r6.  New r11 registrations total
    # 11 (budget exactly met): 4 take window slots here, 7 queued for r12
    # (see the note after the list); behaviorally-changed queries
    # re-enter for fresh verdicts (6); the one remaining slot goes to
    # the oldest r6 re-confirm (39 + 4 + 6 + 1 = 50).
    # (1) all 39 r5-vintage re-confirms:
    "array_funcs",                    # r5
    "case_when_dispatch",             # r5
    "cast_try_cast",                  # r5
    "date_funcs",                     # r5
    "filter_like_regex",              # r5
    "funnel_conversion",              # r5
    "hash_funcs",                     # r5
    "hash_funcs_xxhash64",            # r5
    "join_asof_event_order",          # r5
    "join_broadcast_dim",             # r5
    "join_left_anti",                 # r5
    "join_left_right_outer",          # r5
    "join_left_semi",                 # r5
    "join_range_binned",              # r5
    "join_skew_salted",               # r5
    "json_funcs",                     # r5
    "map_funcs",                      # r5
    "multimodal_decode_stub",         # r5
    "pack_sequence_bins",             # r5
    "retention_cohort",               # r5
    "sample_balance_buckets",         # r5
    "sample_token_budget",            # r5
    "str_funcs",                      # r5
    "text_dedup_exact",               # r5
    "text_fingerprint_rolling",       # r5
    "text_lang_id_ngram",             # r5
    "text_perplexity_unigram",        # r5
    "text_quality_score",             # r5
    "text_token_count_regex",         # r5
    "text_tokenize_stats",            # r5
    "ts_gapfill_locf",                # r5
    "ts_interpolate_linear",          # r5
    "ts_resample_ohlc",               # r5
    "vec_ann_lsh",                    # r5 (rows-only by design; re-run)
    "win_first_last_value",           # r5
    "win_lag_lead",                   # r5
    "win_rank_dense_rank",            # r5
    "win_row_number_topk_per_group",  # r5
    "win_running_sum_frame",          # r5
    # (2) NEW r11 registrations (first driver contact):
    "text_html_extract",              # WET extraction, exact oracle
    "multimodal_video_frames",        # raw-DIB AVI frame stats, exact
    "multimodal_video_neardup",       # MJPEG frame dHash near-dup (rows)
    "multimodal_video_keyframes",     # scene-cut delta energy, exact
    # (3) behaviorally-changed in r11, re-enter for fresh verdicts:
    #     the streaming stores moved to the append-only delta layout
    #     (composed chain reads), and both CC loops changed their
    #     convergence probes (+ non-convergence fail-stop).
    "stream_cdc_mirror",              # delta-layout store (was r7)
    "stream_cdc_mirror_keyed",        # delta-layout store (was r10)
    "stream_incremental_curation",    # delta-layout store (was r8)
    "stream_substring_dedup",         # delta-layout store (was r9)
    "dedup_cluster_components",       # probe fail-stop (was r10)
    "dedup_cluster_components_star",  # probe economy (was r10)
    # (4) oldest r6 re-confirm fills the last slot:
    "agg_histogram_width_bucket",     # r6
    # (ALSO queued for r12, first driver contact: the seven late-r11
    #  registrations text_perplexity_bigram, text_tokenize_wordpiece,
    #  corpus_shard_manifest, vec_contamination_semantic,
    #  text_blocklist_filter, vec_dedup_semantic_incremental,
    #  text_repetition_scrub — registered
    #  after the 50-slot window filled; until then their evidence is
    #  the oracle sweep, tests/test_queries_oracle.py.
    #  r6 vintages queued for the r12 window: agg_hll_sketch_union
    #  (displaced by multimodal_video_keyframes), corpus_stats_report,
    #  dedup_cluster_stats, dedup_containment, join_asof_tolerance,
    #  join_null_safe_eq, join_theta_range, merge_upsert_scd1,
    #  multimodal_phash_dedup, the 14 report_* TPC-H rows,
    #  rollup_incremental_refresh, sample_importance_weighted,
    #  sample_token_budget_bpe, scd2_point_in_time,
    #  sink_bucketed_colocated_join, sink_snapshot_time_travel,
    #  source_csv_permissive_corrupt, source_python_datasource,
    #  text_chunk_split, text_dedup_exact_incremental,
    #  text_dedup_minhash(_incremental), text_gopher_quality_filter,
    #  text_quality_classifier_hashed, text_token_entropy,
    #  udtf_python_native, vec_ann_ivfpq, vec_ann_pq,
    #  vec_dedup_semantic, vec_pca_project, vec_triplet_mining —
    #  until then their evidence is the full-registry DuckDB sweep,
    #  tests/test_queries_oracle.py, run on HEAD each round)
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
