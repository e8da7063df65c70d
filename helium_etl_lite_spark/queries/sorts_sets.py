"""§2.4.F — sorts / limits / top-k / set ops.

The driver's value-hash is order-insensitive, so sort queries also emit
a row_number computed over the declared total order — that turns
ordering semantics (incl. nulls placement) into a checkable value.

Scale notes: global orderBy is a range-partitioned total sort (sampled
boundaries) — fine; orderBy().limit(k) is optimized by Spark into
per-partition top-k + single merge (TakeOrderedAndProject), which is
the only sane global top-k at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "sort_multi_key",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey,
           NULLIF(s_acctbal, 0) AS bal_or_null,
           row_number() OVER (
             ORDER BY s_nationkey ASC, NULLIF(s_acctbal, 0) DESC NULLS FIRST,
                      s_suppkey ASC) AS pos
    FROM supplier
    """,
)
def sort_multi_key(spark, sf_dir):
    t = Tables(spark, sf_dir)
    bal = F.nullif(F.col("s_acctbal"), F.lit(0.0))
    df = t.supplier.select(
        "s_suppkey", "s_name", "s_nationkey", bal.alias("bal_or_null")
    )
    w = W.orderBy(
        F.col("s_nationkey").asc(),
        F.col("bal_or_null").desc_nulls_first(),
        F.col("s_suppkey").asc(),
    )
    return df.withColumn("pos", F.row_number().over(w)).orderBy("pos")


@query(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def limit_topk(spark, sf_dir):
    # Spark plans this as TakeOrderedAndProject: per-partition heap
    # top-k, then a k-way merge on the driver — no global sort.
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "distinct_dedup",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    """,
)
def distinct_dedup(spark, sf_dir):
    # E15 analog: duplicate elimination (PK-idempotence of the
    # transactions sink, reference migrations/V3:43).
    t = Tables(spark, sf_dir)
    return t.lineitem.select("l_returnflag", "l_linestatus", "l_shipdate").distinct()


def _typed_users(t):
    s = (
        t.events.where(F.col("event_type") == "signup")
        .select("user_id")
    )
    e = (
        t.events.where(F.col("event_type") == "error")
        .select("user_id")
    )
    return s, e


@query(
    "set_union_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    UNION ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_union_all(spark, sf_dir):
    s, e = _typed_users(Tables(spark, sf_dir))
    return s.unionByName(e)


@query(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_union_distinct(spark, sf_dir):
    s, e = _typed_users(Tables(spark, sf_dir))
    return s.unionByName(e).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark, sf_dir):
    s, e = _typed_users(Tables(spark, sf_dir))
    return s.intersect(e)


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'signup'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_except(spark, sf_dir):
    s, e = _typed_users(Tables(spark, sf_dir))
    return s.exceptAll(e)
