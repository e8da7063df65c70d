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
    # r13 rotation (r12 verdict directive 1): the 9 r12 registrations
    # take their FIRST driver contact, text_dedup_minhash clears the
    # last pre-r7 verdict (r6, rows-only by design — its exact portable
    # twin was driver-exact at r8), and 40 of the 50 r7-vintage
    # re-confirms fill the rest (9 + 1 + 40 = 50).  The directive's
    # "no verdict older than r8" target is arithmetically out of reach
    # this round (50 r7-vintage verdicts exist, only 40 slots remain) —
    # the 10 held for r14 are chosen to carry the LEAST re-run
    # information: the 6 rows-only-by-design r7s (a rows-only re-run
    # re-confirms nothing an exact verdict wouldn't; each has a
    # driver-exact portable twin or pytest recall gate) plus the
    # UDF-contract trio and win_ntile (single-operator queries whose
    # code has not changed since r2 and which the full-registry pytest
    # oracle sweep re-proves on HEAD every round).
    # (1) the 9 first-contact r12 registrations:
    "url_canonicalize",                # C4 URL canon, exact
    "url_host_stats",                  # per-host corpus stats, exact
    "url_blocklist_filter",            # host blocklist gate, exact
    "url_dedup_canonical",             # recrawl collapse, exact
    "text_pii_redact",                 # PII scrub + redacted md5, exact
    "pipeline_web_curation",           # C4 front-end flagship, exact
    "corpus_truncation_report",        # truncation-loss report, exact
    "text_ccnet_perplexity_buckets",   # CCNet terciles, exact
    "multimodal_pair_dedup",           # image-text pairs (rows by design)
    # (2) the last pre-r7 verdict:
    "text_dedup_minhash",              # r6 (rows-only by design; re-run)
    # (3) 40 of the 50 r7-vintage re-confirms:
    "agg_count_min_sketch",            # r7
    "distinct_dedup",                  # r7
    "dq_expectations_report",          # r7
    "join_cross",                      # r7
    "join_full_outer",                 # r7
    "join_interval_overlap",           # r7
    "limit_topk",                      # r7
    "multimodal_png_decode",           # r7
    "pipeline_pretraining_select",     # r7
    "report_parts_supplier_count",     # r7
    "report_priority_shipping",        # r7
    "report_product_profit",           # r7
    "report_waiting_suppliers",        # r7
    "sample_mixture_interleave",       # r7
    "sample_mixture_temperature",      # r7
    "sample_reservoir_per_group",      # r7
    "sample_split_train_test",         # r7
    "scan_parquet",                    # r7
    "scan_predicate_pushdown",         # r7
    "scan_projection_pushdown",        # r7
    "set_except",                      # r7
    "set_intersect",                   # r7
    "set_union_all",                   # r7
    "set_union_distinct",              # r7
    "sink_compact_files",              # r7
    "sink_roundtrip_parquet",          # r7
    "sink_snapshot_changes",           # r7
    "sink_snapshot_changes_apply",     # r7
    "sort_multi_key",                  # r7
    "source_json_lines",               # r7
    "source_schema_evolution",         # r7
    "stream_cursor_incremental",       # r7
    "stream_dedup_by_key",             # r7
    "stream_session_window",           # r7
    "stream_sliding_window_agg",       # r7
    "stream_tumbling_window_agg",      # r7
    "stream_watermark_late_drop",      # r7
    "text_fuzzy_levenshtein",          # r7
    "text_paragraph_dedup",            # r7
    "text_tfidf",                      # r7
    # (QUEUED for r14: the 10 r7-vintage holds —
    #  dedup_containment_screened, graph_pagerank_topk,
    #  multimodal_jpeg_decode, pipeline_pretraining_select_bpe,
    #  text_dedup_simhash, vec_ann_pq_rerank (rows-only by design),
    #  udaf_grouped_agg, udf_pandas_vectorized, udf_scalar_python,
    #  win_ntile — plus the 6 NEW r13 registrations
    #  (url_dedup_canonical_incremental, stream_url_dedup_canonical,
    #  multimodal_pair_dedup_portable, text_dsir_importance,
    #  sample_dsir_token_budget, text_perplexity_kneser_ney — all six
    #  oracle-exact at sf0.001 AND sf0.01 before registration), which
    #  per the r11 verdict are
    #  capped out of the same-round rotation; until then their
    #  evidence is the full-registry DuckDB oracle sweep,
    #  tests/test_queries_oracle.py, run on HEAD each round.)
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
