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
    # r7 rotation. Priority when the window overflows: (1) queries with
    # NO driver verdict yet (first-time registrations — an unverified
    # row is worse than an unrefreshed one), then (2) r7-changed
    # queries (grouped control-plane reshapes, hashed-span key,
    # length-band blocking), then (3) the r6-queued stale re-verdicts
    # (implementations changed in r6 AFTER their last driver check),
    # then (4) oldest-verdict re-confirms (r1/r2/r3 vintages). All 45
    # r6-new queries got their verdicts in CORRECTNESS_r06 (45/45
    # clean) and rotate out.
    # (a) NEW in r7:
    "sample_mixture_temperature",
    "join_interval_overlap",
    "dq_expectations_report",
    "multimodal_jpeg_decode",
    "agg_count_min_sketch",
    "vec_ann_pq_rerank",
    "sink_snapshot_changes",
    "sink_snapshot_changes_apply",
    "dedup_containment_screened",
    "pipeline_pretraining_select_bpe",
    "multimodal_png_decode",
    "graph_pagerank_topk",
    "report_product_profit",
    "report_priority_shipping",
    "report_waiting_suppliers",
    "report_parts_supplier_count",
    # (b) changed in r7 — re-verify:
    "win_ntile",                  # grouped_ntile control plane
    "sample_mixture_interleave",  # grouped_row_number control plane
    "sample_reservoir_per_group", # grouped_row_number control plane
    "text_paragraph_dedup",       # span window keys on xxhash64(span)
    "text_fuzzy_levenshtein",     # (first_char, length-band) block key
    "pipeline_pretraining_select",  # stages 1-4 refactored into shared helper
    # (c) r6-changed after last driver verdict (queued from r6):
    "text_tfidf",                 # n_docs fold (changed r6, verdict r5)
    "text_dedup_simhash",         # dedup.py NULL-token change (r6, verdict r5)
    "source_schema_evolution",    # scratch-dir plumbing (r6, verdict r5)
    "sink_roundtrip_parquet",     # scratch-dir plumbing (r6, verdict r4)
    "sink_compact_files",         # scratch-dir plumbing (r6, verdict r4)
    # (d) oldest-verdict re-confirms:
    "join_full_outer",            # r1
    "join_cross",                 # r1
    "scan_parquet",               # r2
    "scan_projection_pushdown",   # r2
    "scan_predicate_pushdown",    # r2
    "source_json_lines",          # r2
    "sort_multi_key",             # r2
    "limit_topk",                 # r2
    "distinct_dedup",             # r2
    "set_union_all",              # r2
    "set_union_distinct",         # r2
    "set_intersect",              # r2
    "set_except",                 # r2
    "stream_tumbling_window_agg", # r2
    "stream_sliding_window_agg",  # r2
    "stream_session_window",      # r2
    "stream_watermark_late_drop", # r2
    "stream_dedup_by_key",        # r2
    "stream_cursor_incremental",  # r2
    "udf_scalar_python",          # r2
    "udf_pandas_vectorized",      # r2
    "udaf_grouped_agg",           # r2
    "sample_split_train_test",    # r7: md5 buckets, now exact-oracle
    # (stream_stream_interval_join / win_sliding_avg_range_frame /
    #  math_funcs / vec_cluster_assign / text_lang_topk re-confirms
    #  displaced by late-r7 registrations and changes — their r3
    #  verdicts remain on record)
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
