"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in helium_etl_lite_spark/ — queries register into
helium_etl_lite_spark.registry via the modules in
helium_etl_lite_spark/queries/ (one per SURVEY.md §2.4 section).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from helium_etl_lite_spark import registry  # noqa: E402
from helium_etl_lite_spark.tables import Tables  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: pricing summary over the
    5-table star (scan → broadcast-dim join → hash agg → window top-k →
    sort), exercising the full relational pipeline in one plan."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    t = Tables(spark, "/root/testdata/sf0.001")
    # manual partial-agg pushdown: reduce lineitem per orderkey before
    # the orders join (see join_multiway_star for the rationale)
    li = t.lineitem.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("order_rev"),
        F.sum("l_quantity").alias("order_qty"),
        F.count(F.lit(1)).alias("order_items"),
    )
    star = (
        li.join(t.orders, li.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
        .join(F.broadcast(t.region), t.nation.n_regionkey == t.region.r_regionkey)
    )
    per_nation = star.groupBy("r_name", "n_name").agg(
        F.round(F.sum("order_rev"), 2).alias("revenue"),
        F.sum("order_qty").alias("sum_qty"),
        F.sum("order_items").alias("n_items"),
    )
    w = W.partitionBy("r_name").orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    return (
        per_nation.withColumn("rank_in_region", F.row_number().over(w))
        .where(F.col("rank_in_region") <= 3)
        .orderBy("r_name", "rank_in_region")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every exact-checkable query."""
    return dict(registry.ORACLES)
