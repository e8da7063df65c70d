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


def load_all() -> None:
    """Import every query module so registrations run."""
    from .queries import (  # noqa: F401
        aggregates,
        extras,
        filters,
        joins,
        llm_ops,
        scalar_funcs,
        scans,
        sorts_sets,
        streaming_batch,
        udfs,
        windows,
    )
