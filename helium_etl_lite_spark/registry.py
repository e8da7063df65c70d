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
    # r12 rotation (r11 verdict directive 1): the 7 late-r11
    # registrations take their FIRST driver contact, and 43 of the 44
    # r6-vintage re-confirms fill the rest (7 + 43 = 50).  The one
    # r6-vintage query held back for r13 is text_dedup_minhash — its
    # verdict class is rows-only BY DESIGN (engine-specific minhash
    # permutation) so a re-run carries the least information, and its
    # exact portable twin text_dedup_minhash_portable was driver-exact
    # at r8.  After this round every query has a driver verdict and at
    # most one verdict on record is older than r7 (the directive's
    # "≤1 older than r7" target, met exactly).
    # (1) the 7 first-contact r11 registrations:
    "text_perplexity_bigram",          # bigram LM + stupid backoff, exact
    "text_tokenize_wordpiece",         # WordPiece greedy walk, exact
    "corpus_shard_manifest",           # deterministic shard plan, exact
    "vec_contamination_semantic",      # embedding decontamination, exact
    "text_blocklist_filter",           # C4 blocklist gate, exact
    "vec_dedup_semantic_incremental",  # SemDeDup state (rows by design)
    "text_repetition_scrub",           # Gopher repetition removal, exact
    # (2) 43 of the 44 r6-vintage re-confirms:
    "agg_hll_sketch_union",            # r6
    "corpus_stats_report",             # r6
    "dedup_cluster_stats",             # r6
    "dedup_containment",               # r6
    "join_asof_tolerance",             # r6
    "join_null_safe_eq",               # r6
    "join_theta_range",                # r6
    "merge_upsert_scd1",               # r6
    "multimodal_phash_dedup",          # r6 (rows-only by design; re-run)
    "report_customer_distribution",    # r6
    "report_discounted_revenue",       # r6
    "report_dormant_accounts",         # r6
    "report_large_orders",             # r6
    "report_local_supplier_volume",    # r6
    "report_market_share",             # r6
    "report_order_priority",           # r6
    "report_pricing_summary",          # r6
    "report_promo_revenue",            # r6
    "report_returned_items",           # r6
    "report_shipping_priority",        # r6
    "report_small_quantity_revenue",   # r6
    "report_top_supplier",             # r6
    "report_volume_shipping",          # r6
    "rollup_incremental_refresh",      # r6
    "sample_importance_weighted",      # r6
    "sample_token_budget_bpe",         # r6
    "scd2_point_in_time",              # r6
    "sink_bucketed_colocated_join",    # r6
    "sink_snapshot_time_travel",       # r6
    "source_csv_permissive_corrupt",   # r6
    "source_python_datasource",        # r6
    "text_chunk_split",                # r6
    "text_dedup_exact_incremental",    # r6
    "text_dedup_minhash_incremental",  # r6 (rows-only by design; re-run)
    "text_gopher_quality_filter",      # r6
    "text_quality_classifier_hashed",  # r6
    "text_token_entropy",              # r6
    "udtf_python_native",              # r6
    "vec_ann_ivfpq",                   # r6 (rows-only by design; re-run)
    "vec_ann_pq",                      # r6 (rows-only by design; re-run)
    "vec_dedup_semantic",              # r6
    "vec_pca_project",                 # r6
    "vec_triplet_mining",              # r6
    # (QUEUED for r13: text_dedup_minhash (r6, rows-only by design —
    #  see the rotation note above) plus any NEW r12 registrations,
    #  which per the r11 verdict are capped out of this rotation; until
    #  then their evidence is the full-registry DuckDB oracle sweep,
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
