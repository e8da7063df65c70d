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
    # r9 rotation (r8 verdict directives 1+2).
    # (1) ALL 12 never-driver-checked registrations drain FIRST — this
    #     converts their pytest-only evidence into hard driver signal:
    "agg_bitmap_setops",          # bitmap AND/OR/XOR algebra, exact
    "join_asof_nearest",          # nearest-neighbor as-of join, exact
    "join_spatial_knn_grid",      # 9-cell grid kNN, exact, no-BNLJ pinned
    "merge_upsert_scd2",          # SCD2 close-and-open merge, exact
    "sink_bloom_skipping_index",  # bloom data-skipping sidecar, exact
    "stream_incremental_curation", # TRUE streaming curation twin, exact
    "table_analyze_stats",        # ANALYZE-style column stats, exact
    "text_dedup_winnow",          # winnowing-screened near-dup, exact
    "ts_ewma_portable",           # integer-exact EWMA recurrence, exact
    "vec_ann_ivfpq_portable",     # IVFADC residual-PQ + rerank, exact
    "vec_ann_lsh_multiprobe_portable", # hamming-7 multiprobe LSH, exact
    "vec_knn_classify",           # kNN majority-vote classify, exact
    # (2) retire the FULL r2/r3 verdict cohort (oldest first) — after
    #     this round no verdict on record is older than r4:
    "stream_stateful_running_count",  # r2
    "udtf_flatten",                   # r2
    "feature_user_activity",          # r3
    "math_funcs",                     # r3
    "multimodal_feature_extract",     # r3
    "multimodal_frame_sample",        # r3
    "multimodal_resize",              # r3
    "sample_stratified",              # r3
    "source_csv_roundtrip",           # r3
    "stream_stream_interval_join",    # r3
    "text_clean_normalize",           # r3
    "text_dedup_keep_longest",        # r3
    "text_lang_topk",                 # r3
    "text_ngram_topk",                # r3
    "text_pii_scrub",                 # r3
    "text_repetition_stats",          # r3
    "text_vocab_prune",               # r3
    "vec_ann_ivf",                    # r3 (rows-only by design; re-run)
    "vec_cluster_assign",             # r3
    "vec_kmeans",                     # r3 (rows-only by design; re-run)
    "vec_quantize_int8",              # r3
    "win_sliding_avg_range_frame",    # r3
    # (3) NEW r9 registrations (first driver contact — a first verdict
    #     on an exact query outranks an r4 re-confirm):
    "text_dedup_substring_anchor",    # suffix-anchor exact-substring dedup
    "retrieval_rrf_hybrid",           # BM25 + ANN reciprocal-rank fusion
    "text_contamination_substring",   # substring-grade decontamination
    "text_dedup_substring_anchor_incremental",  # span-state ingest loop
    "agg_kmv_theta_sketch_portable",  # KMV/theta sketch set-op estimates
    "sample_weighted_reservoir",      # Efraimidis-Spirakis A-Res top-k
    "stream_substring_dedup",         # streaming span-state ingest loop
    "agg_kmv_theta_anotb_portable",   # theta-sketch difference estimate
    # (4) oldest r4 re-confirms fill the remaining slots (the rest of
    #     the r4 cohort rolls to r10):
    "project_rename_cast",            # r4
    "filter_equality",                # r4
    "filter_range_and_or_not",        # r4
    "agg_global",                     # r4
    "agg_groupby_hash",               # r4
    "agg_count_distinct",             # r4
    # (3b) r9 implementation changes (a changed query needs a fresh
    #      verdict more than an r4 re-confirm — these displace
    #      agg_collect_list_set + agg_percentile to r10):
    "graph_kcore_peel",               # r9 delta-peel rewrite, 2.5x
    "graph_reachability_recursive",   # r9 hoisted-edge recursion, 1.7x
    # (remaining r4 vintages queue for the r10 window:
    #  agg_approx_count_distinct, agg_avg_stddev_var,
    #  agg_grouping_sets,
    #  agg_rollup, agg_cube,
    #  agg_having, agg_collect_list_set, agg_percentile, agg_partial_final,
    #  join_multiway_star, vec_knn_cosine, agg_argminmax, agg_corr_covar,
    #  agg_mode_deterministic, agg_percentile_approx, agg_pivot,
    #  agg_string_listagg, anomaly_zscore, dedup_cluster_components,
    #  dedup_ngram_jaccard, exists_in_block_range, json_variant_extract,
    #  rollup_time_hypertable, scd2_intervals, sessionize_gap30,
    #  sink_partitioned_prune, source_orc_roundtrip, subquery_in_exists,
    #  subquery_scalar, text_contamination_ngram, unpivot_melt,
    #  win_cume_dist_nth, pipeline_corpus_curation, vec_dedup_cosine —
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
