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
    # r14 rotation (r13 verdict directive 1): the 6 r13 registrations
    # take their FIRST driver contact (all oracle-bearing — expect 6
    # exact), the 10 r7-vintage holds clear the oldest verdicts, and 34
    # of the 47 r8-vintage re-confirms fill the rest (6 + 10 + 34 = 50).
    # The 13 r8s held for r15 are chosen to carry the LEAST re-run
    # information: the 1 rows-only-by-design r8 (multimodal_phash_neardup
    # — a rows-only re-run re-confirms nothing; its recall gate is
    # pytest-pinned) plus 12 of the 15 r8 portable twins (pure
    # integer-deterministic functions over fixed input whose exactness
    # the full-registry pytest oracle sweep re-proves on HEAD every
    # round; 3 portables stay in-window so the class itself still gets
    # a fresh driver point).
    # (1) the 6 first-contact r13 registrations:
    "text_dsir_importance",            # DSIR importance weights, exact
    "sample_dsir_token_budget",        # DSIR top-score token budget, exact
    "text_perplexity_kneser_ney",      # interpolated-KN bigram PPL, exact
    "url_dedup_canonical_incremental", # URL dedup w/ persisted state, exact
    "stream_url_dedup_canonical",      # true-streaming URL dedup, exact
    "multimodal_pair_dedup_portable",  # pair keeper policy, exact
    # (2) the 10 r7-vintage holds:
    "udf_scalar_python",               # r7
    "udf_pandas_vectorized",           # r7
    "udaf_grouped_agg",                # r7
    "win_ntile",                       # r7
    "text_dedup_simhash",              # r7 (rows-only by design)
    "dedup_containment_screened",      # r7 (rows-only by design)
    "graph_pagerank_topk",             # r7 (rows-only by design)
    "multimodal_jpeg_decode",          # r7 (rows-only by design)
    "pipeline_pretraining_select_bpe", # r7 (rows-only by design)
    "vec_ann_pq_rerank",               # r7 (rows-only by design)
    # (3) 34 of the 47 r8-vintage re-confirms:
    "agg_bitmap_distinct",             # r8
    "agg_bloom_filter_probe",          # r8
    "agg_chi_square_independence",     # r8
    "agg_grid_hotspot",                # r8
    "agg_ks_drift_binned",             # r8
    "agg_quantile_sketch_grouped",     # r8
    "dedup_containment_screened_portable",  # r8
    "dq_referential_integrity",        # r8
    "er_sorted_neighborhood",          # r8
    "graph_triangle_count",            # r8
    "join_bloom_pruned",               # r8
    "join_lateral_topk",               # r8
    "join_spatial_grid",               # r8
    "multimodal_wav_decode",           # r8
    "pack_concat_chunk",               # r8
    "pipeline_incremental_curation",   # r8
    "report_excess_inventory",         # r8
    "report_forecast_revenue",         # r8
    "report_important_stock",          # r8
    "report_min_cost_supplier",        # r8
    "sample_quota_waterfill",          # r8
    "sink_file_skipping_index",        # r8
    "sink_zorder_cluster",             # r8
    "table_diff_audit",                # r8
    "text_bm25_topk",                  # r8
    "text_dedup_source_priority",      # r8
    "text_fingerprint_winnow",         # r8
    "text_inverted_index",             # r8
    "text_inverted_index_incremental", # r8
    "text_span_dedup_overlap",         # r8
    "ts_event_transitions",            # r8
    "view_incremental_join_refresh",   # r8
    "vec_kmeans_portable",             # r8 (portable kept in-window)
    "vec_pca_portable",                # r8 (portable kept in-window)
    # (QUEUED for r15: the 13 r8-vintage holds —
    #  multimodal_phash_neardup (rows-only by design),
    #  agg_hll_sketch_portable, agg_quantile_sketch_portable,
    #  graph_pagerank_portable, sample_token_budget_bpe_portable,
    #  text_bpe_train_portable, text_dedup_minhash_portable,
    #  text_dedup_simhash_portable, vec_ann_bitsample_portable,
    #  vec_ann_ivf_portable, vec_ann_lsh_portable, vec_ann_pq_portable,
    #  vec_dedup_semantic_portable — plus any NEW r14 registrations,
    #  which per the r11 verdict are capped out of the same-round
    #  rotation; until then their evidence is the full-registry DuckDB
    #  oracle sweep, tests/test_queries_oracle.py, run on HEAD each
    #  round.)
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
