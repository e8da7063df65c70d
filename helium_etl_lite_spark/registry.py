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
    # r8 rotation (r7 verdict directive 5: oldest vintages first).
    # Priority: (1) r8 first-time registrations (24 of them — the
    # second r8 build session added triangles/k-core/bloom-join/
    # Z-order/ER/bitsample/BM25/WAV/lateral/bitmap), (2) r8-changed
    # queries, (3) EVERY remaining r2/r3-vintage verdict (the full
    # cohort — after this round no verdict on record is older than
    # r4), (4) the oldest r4 re-confirms up to the 50-slot boundary
    # (the remaining ~31 r4s roll to r9). All 23 r7-window queries
    # were confirmed clean in CORRECTNESS_r07 and rotate out.
    # (a) NEW in r8:
    # (a2) seventh-session first-time registrations (all exact): the
    # five portable twins that close every remaining closable
    # rows-only class (hyperplane LSH, SemDeDup, PCA eigensolve, BPE
    # training, BPE-priced budget selection), the screened-containment
    # composition made exact (the cap is deterministic => expressible),
    # and the closed-form waterfill quota allocator. They displace the
    # seven listed at the end of this comment block — each displaced
    # query's NOVEL machinery is also exercised by an in-window
    # sibling (bitmap algebra by agg_bitmap_distinct; winnowing by
    # text_fingerprint_winnow; IVFADC by ivf+pq portables; the shared
    # curation oracle by pipeline_incremental_curation; bloom cells by
    # agg_bloom_filter_probe + file skipping by sink_file_skipping_
    # index; SCD2 close-and-open by scd2_intervals/merge_upsert_scd1
    # verdicts; the integer-recurrence fold by graph_kcore_peel/
    # pagerank_portable), so a driver verdict on them adds the least
    # new information. Displaced to r9 FIRST: agg_bitmap_setops,
    # text_dedup_winnow, vec_ann_ivfpq_portable,
    # stream_incremental_curation, sink_bloom_skipping_index,
    # merge_upsert_scd2, ts_ewma_portable; table_analyze_stats (plain
    # aggregate machinery, covered by the sweep) displaced for
    # pack_concat_chunk; vec_knn_classify (kNN machinery driver-
    # verified via vec_knn_cosine r4) displaced for
    # text_inverted_index; join_asof_nearest (third member of the
    # as-of family, driver-verified twice already via event_order
    # r5 + tolerance r6) displaced for
    # text_inverted_index_incremental. join_spatial_knn_grid (the
    # last seventh-session registration) queues for r9 instead of
    # displacing an in-window first-timer: its evidence until then
    # is the full-registry sweep + individual sf0.001/sf0.01 exact
    # passes + the no-BNLJ plan test. vec_ann_lsh_multiprobe_portable
    # queues for r9 on the same basis (numpy pigeonhole pytest).
    "dedup_containment_screened_portable",  # screen+cap+verify, exact
    "vec_ann_lsh_portable",       # hyperplane LSH + integer rerank, exact
    "vec_dedup_semantic_portable", # SemDeDup on integer codebook, exact
    "vec_pca_portable",           # power-iteration PCA, exact unrolled
    "text_bpe_train_portable",    # BPE merge learning, exact unrolled
    "sample_token_budget_bpe_portable", # BPE-priced budget select, exact
    "sample_quota_waterfill",     # closed-form waterfill quotas, exact
    "pack_concat_chunk",          # concat-and-chunk example packing, exact
    "text_inverted_index",        # postings-list index build, exact
    "text_inverted_index_incremental", # segment-merge == full rebuild
    "report_forecast_revenue",    # TPC-H Q6
    "report_min_cost_supplier",   # TPC-H Q2
    "report_important_stock",     # TPC-H Q11
    "report_excess_inventory",    # TPC-H Q20
    "text_span_dedup_overlap",    # stride-10 alignment-robust dedup
    "text_fingerprint_winnow",    # winnowing fingerprints (MOSS)
    "agg_bloom_filter_probe",     # exact cross-engine bloom sketch
    "multimodal_phash_neardup",   # hamming-band image near-dup
    "stream_cdc_mirror",          # streaming CDC consumer, exact oracle
    "text_dedup_minhash_portable", # full LSH pipeline, exact oracle
    "agg_hll_sketch_portable",    # register-exact HLL + merge proof
    "text_dedup_simhash_portable", # full SimHash pipeline, exact oracle
    "graph_triangle_count",       # compact-forward triangles, exact oracle
    "join_bloom_pruned",          # runtime-bloom-filter join, exact oracle
    "sink_zorder_cluster",        # Morton-clustered write, exact oracle
    "er_sorted_neighborhood",     # sorted-neighborhood ER, exact oracle
    "vec_ann_bitsample_portable", # integer bit-sampling LSH, exact oracle
    "graph_kcore_peel",           # iterative k-core, exact unrolled oracle
    "text_bm25_topk",             # BM25 ranked retrieval, exact oracle
    "multimodal_wav_decode",      # RIFF/WAV PCM codec, exact oracle
    "join_lateral_topk",          # correlated LATERAL top-k, exact oracle
    "agg_bitmap_distinct",        # re-aggregatable bitmap distinct, exact
    "vec_kmeans_portable",        # integer-exact Lloyd k-means, exact oracle
    "vec_ann_ivf_portable",       # integer-exact IVF train+probe, exact oracle
    "sink_file_skipping_index",   # footer min/max data skipping, exact
    "agg_quantile_sketch_portable", # mergeable histogram quantiles, exact
    "view_incremental_join_refresh", # delta-rule join-view IVM, exact
    "pipeline_incremental_curation", # CDC-fed incremental curation loop, exact
    "text_dedup_source_priority", # keep-best-source exact dedup, exact
    "table_diff_audit",           # keyed data-diff reconciliation, exact
    "vec_ann_pq_portable",        # integer-exact PQ train+encode+ADC, exact
    "graph_pagerank_portable",    # integer-mass PageRank, unrolled oracle
    "agg_quantile_sketch_grouped", # per-group mergeable quantiles, exact
    "join_spatial_grid",          # grid-binned spatial radius join, exact
    "graph_reachability_recursive", # WITH RECURSIVE BFS, shared SQL oracle
    "agg_grid_hotspot",           # raster + 3x3 stencil scatter-gather, exact
    # (b) sixth-session first-time registrations (exact oracles; a
    # first driver verdict on an exact query outranks both a rows-only
    # re-run of an r8-changed query and an r2 re-confirm, so these four
    # displaced dedup_containment_screened + graph_pagerank_topk
    # (r8-changed but rows-only-by-design — their r8 behavior changes
    # are pinned by pytest property gates that the judge reruns on
    # HEAD) and the two r2 vintages stream_stateful_running_count +
    # udtf_flatten (unchanged since r2; covered by the full-registry
    # DuckDB sweep). All four displaced names queue FIRST for r9.
    "dq_referential_integrity",   # FK orphan audit, one scan per child
    "ts_event_transitions",       # Markov transition counts, exact
    "agg_chi_square_independence", # chi-square independence test, exact
    "agg_ks_drift_binned",        # binned two-sample KS drift, exact
    # (d) r3 vintages (complete cohort):
    # (math_funcs + vec_cluster_assign + text_lang_topk +
    #  win_sliding_avg_range_frame +
    #  stream_stream_interval_join displaced to r9 by the fifth-session
    #  join_spatial_grid / ts_ewma_portable /
    #  graph_reachability_recursive / agg_grid_hotspot /
    #  merge_upsert_scd2 registrations above — the fifth session filled
    #  the whole r2/r3 re-confirm tail with first-time registrations,
    #  which outrank re-confirms. Fifth-session registrations past the
    #  50-slot boundary (dq_referential_integrity onward) queue for the
    #  r9 window alongside the re-confirm cohort; until then their
    #  driver-grade evidence is the full-registry DuckDB sweep
    #  (tests/test_queries_oracle.py), which runs every query on HEAD;
    #  vec_ann_ivf + vec_kmeans + feature_user_activity +
    #  multimodal_feature_extract +
    #  multimodal_frame_sample +
    #  multimodal_resize + sample_stratified
    #  + text_clean_normalize +
    #  text_dedup_keep_longest + text_ngram_topk + text_pii_scrub +
    #  text_repetition_stats + text_vocab_prune + source_csv_roundtrip
    #  + vec_quantize_int8 r3 re-confirms rolled to r9 — displaced by
    #  the r8 third/fourth-session registrations above)
    # (e) r4 re-confirms: none this round — both tail slots went to the
    # new portable exact queries above.
    # (remaining r4 vintages — project_rename_cast, filter_equality,
    #  filter_range_and_or_not, agg_global,
    #  agg_groupby_hash, agg_count_distinct,
    #  agg_approx_count_distinct, agg_avg_stddev_var, agg_grouping_sets,
    #  agg_rollup, agg_cube, agg_having,
    #  agg_collect_list_set, agg_percentile,
    #  agg_partial_final,
    #  join_multiway_star,
    #  vec_knn_cosine,
    #  agg_argminmax, agg_corr_covar,
    #  agg_mode_deterministic, agg_percentile_approx, agg_pivot,
    #  agg_string_listagg, anomaly_zscore, dedup_cluster_components,
    #  dedup_ngram_jaccard, exists_in_block_range, json_variant_extract,
    #  rollup_time_hypertable, scd2_intervals, sessionize_gap30,
    #  sink_partitioned_prune, source_orc_roundtrip, subquery_in_exists,
    #  subquery_scalar, text_contamination_ngram, unpivot_melt,
    #  win_cume_dist_nth, pipeline_corpus_curation, vec_dedup_cosine —
    #  queue for the r9 window)
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
