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
    # r6 rotation. Priority when the window overflows: (1) queries with
    # NO driver verdict yet (first-time registrations — an unverified
    # row is worse than an unrefreshed one), then (2) r6-changed queries
    # whose change is behavioral (minhash signature formula, join
    # reshape), then (3) r6-changed queries whose change was plumbing
    # (scratch-dir, n_docs fold) — those were rotated OUT this round
    # after the local full-registry sweep (167 exact / 0 fail, README)
    # re-verified them; their driver re-verdicts queue for r7.
    # (a) NEW in r6:
    "sample_mixture_interleave",
    "sample_token_budget_bpe",
    "win_ntile",
    "merge_upsert_scd1",
    "scd2_point_in_time",
    "sample_importance_weighted",
    "text_paragraph_dedup",
    "dedup_cluster_stats",
    "corpus_stats_report",
    "agg_histogram_width_bucket",
    "sink_bucketed_colocated_join",
    "vec_dedup_semantic",       # rewritten r6: sqrt(N) clusters + np kernels
    "join_asof_tolerance",
    "dedup_containment",
    "multimodal_phash_dedup",
    "vec_ann_pq",
    "text_gopher_quality_filter",
    "vec_ann_ivfpq",
    "text_dedup_exact_incremental",
    "rollup_incremental_refresh",
    "join_null_safe_eq",
    "text_token_entropy",
    "vec_triplet_mining",
    "udtf_python_native",
    "source_csv_permissive_corrupt",
    "report_pricing_summary",
    "report_shipping_priority",
    "report_local_supplier_volume",
    "report_large_orders",
    "report_returned_items",
    "text_chunk_split",
    "text_quality_classifier_hashed",
    "report_market_share",
    "report_top_supplier",
    "report_order_priority",
    "vec_pca_project",
    "report_customer_distribution",
    "report_promo_revenue",
    "report_small_quantity_revenue",
    "report_discounted_revenue",
    "agg_hll_sketch_union",
    "source_python_datasource",
    "sink_snapshot_time_travel",
    "pipeline_pretraining_select",
    "report_volume_shipping",
    "report_dormant_accounts",
    # (re-verify r6: minhash signature formula changed to universal-hash)
    # (b) code changed in r6 — re-verify:
    "text_fuzzy_levenshtein",    # vocab join reshaped to first-letter equi-key
    "join_theta_range",          # binned instead of forced part broadcast
    "text_dedup_minhash",        # permutation-collapse fix (ADVICE r5 high)
    "text_dedup_minhash_incremental",  # signature fix + O(batch) fold-in
    # (c) oldest-verdict re-confirms (r1/r2/r3 vintages):
    # (set ops / stream_tumbling re-confirms rotated out in favor of the
    # five new report_* queries — r2 verdicts on those remain on record)
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

    ordered: dict[str, QueryFn] = {}
    for name in FRONT_OF_WINDOW:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)
