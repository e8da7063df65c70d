"""§2.4.E — window functions.

Serving-layer analogs: top-k gateways by rewards (rewards_gateway_idx,
reference migrations/V1__create_rewards.sql:12), block-delta lag over
the height sequence the cursor walks (reference src/follower.rs:86,
SURVEY §2.2). Windows shuffle once on partitionBy keys then sort
within partitions; at 100 TB the partition key must be high-cardinality
(per-customer/per-user here) — a global window (no partitionBy) would
serialize on one task and is avoided everywhere.

Determinism: every orderBy carries a unique tiebreak column; running
sums are computed over integral-valued doubles so sequential FP
accumulation matches the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "win_row_number_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def win_row_number_topk_per_group(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        t.orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
    """,
)
def win_rank_dense_rank(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    w_tb = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w_tb).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           lag(event_id, 2, CAST(-1 AS BIGINT)) OVER w AS prev2_or_default
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def win_lag_lead(spark, sf_dir):
    # Block-delta analog: neighbor offsets within an ordered stream.
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return t.events.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.lag("event_id", 2, -1).over(w).alias("prev2_or_default"),
    )


@query(
    "win_running_sum_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           SUM(l_quantity) OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber ASC, l_extendedprice ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
    FROM lineitem
    """,
)
def win_running_sum_frame(spark, sf_dir):
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    # l_extendedprice completes a total order so the ROWS frame is
    # deterministic.
    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("l_orderkey")
        .orderBy(F.col("l_linenumber").asc(), F.col("l_extendedprice").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.sum("l_quantity").over(w).alias("running_qty"),
    )


@query(
    "win_sliding_avg_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(AVG(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS moving_avg_price,
           COUNT(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_size
    FROM orders
    """,
)
def win_sliding_avg_range_frame(spark, sf_dir):
    t = Tables(spark, sf_dir)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-3, W.currentRow)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.avg("o_totalprice").over(w), 6).alias("moving_avg_price"),
        F.sum(F.lit(1)).over(w).alias("frame_size"),
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)
def win_first_last_value(spark, sf_dir):
    t = Tables(spark, sf_dir)
    ordering = [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    w_first = W.partitionBy("o_custkey").orderBy(*ordering)
    w_full = (
        W.partitionBy("o_custkey")
        .orderBy(*ordering)
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return t.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.first("o_orderkey").over(w_first).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(ntile(8) OVER (
             PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS octile
    FROM customer
    """,
)
def win_ntile(spark, sf_dir):
    # Equal-height bucketing per segment (quantile cohorts, curriculum
    # tiers). c_mktsegment has FIVE values — a plain
    # `ntile(8) OVER (PARTITION BY c_mktsegment ...)` sorts ~20% of the
    # table in ONE task at any scale (r6 verdict item 1). Rebuilt on
    # operators/scale.py grouped_ntile: the window partition becomes
    # (segment, acctbal-bin) — acctbal is bounded, so the bin domain is
    # fixed (~220 bins at width 50) and every sort partition holds
    # ~N_seg/220 rows no matter how big the table gets; the bin
    # offsets come from a bounded counts-table window, and the exact
    # SQL ntile formula is applied to the recovered global rank.
    # Oracle unchanged — results are identical to the window form
    # (property-pinned in tests/test_properties.py).
    from ..operators.scale import grouped_ntile

    t = Tables(spark, sf_dir)
    c = t.customer.select("c_custkey", "c_mktsegment", "c_acctbal")
    out = grouped_ntile(
        c,
        ["c_mktsegment"],
        F.floor(-F.col("c_acctbal") / 50),  # monotone along acctbal DESC
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        n_tiles=8,
        out_col="octile",
    )
    return out.select("c_custkey", "c_mktsegment", "octile")
