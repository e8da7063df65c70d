"""Composite analytics reports — full TPC-H-shaped queries over the
serving tables.

The reference's product surface is the relational schema its migrations
set up for downstream reporting (SURVEY §0/§2.2: migrations/V1:11-12,
V3:43-49 exist so users can run group-by/join reports over rewards and
transactions). The §2.4 checklist verifies each operator in isolation;
this module verifies realistic multi-operator compositions — the shapes
a reporting user actually submits — so join ordering, dimension
broadcasts, and partial aggregation are exercised *together* in one
plan.

Plan discipline (checked in tests/test_plans.py and PLANS.md):
- fixed-cardinality dims (nation 25 rows, region 5) are broadcast
  explicitly — they never scale with sf, so the hint is safe at 100 TB;
- everything that scales (customer/orders/lineitem/supplier) joins
  without hints: AQE picks broadcast when a filtered side measures
  small, sort-merge otherwise;
- aggregations stay two-phase (partial before the exchange) by
  construction — we aggregate on the join output without forcing a
  repartition;
- selective filters (date windows, segment, returnflag) are applied on
  the base tables BEFORE any join so they reach the parquet scan as
  PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..registry import query
from ..tables import Tables


@query(
    "report_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                                          AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                           AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                                                                    AS sum_charge,
           ROUND(AVG(l_quantity), 6)                                AS avg_qty,
           ROUND(AVG(l_extendedprice), 6)                           AS avg_price,
           ROUND(AVG(l_discount), 6)                                AS avg_disc,
           COUNT(*)                                                 AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def report_pricing_summary(spark, sf_dir):
    """TPC-H Q1: the canonical pricing-summary report. One scan, one
    two-phase hash aggregate over a 6-group key space — the shipdate
    predicate is pushed to the parquet scan, and every aggregate is a
    partial/final pair, so the only exchange moves 6 rows per partial."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.where(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp_ntz"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "report_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def report_shipping_priority(spark, sf_dir):
    """TPC-H Q3: unshipped-orders revenue ranking. Both date filters and
    the segment filter hit their base scans as PushedFilters; the
    filtered customer side measures small so AQE broadcasts it into the
    orders join; the top-10 is TakeOrderedAndProject (per-partition
    heaps + driver merge of 10 rows), never a global sort. The tie-break
    on l_orderkey makes the LIMIT deterministic for the oracle hash."""
    t = Tables(spark, sf_dir)
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    cust = t.customer.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    ords = t.orders.where(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = t.lineitem.where(F.col("l_shipdate") > cutoff).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        cust.join(ords, cust["c_custkey"] == ords["o_custkey"])
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "report_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def report_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5: revenue through local suppliers, a 6-table star-plus-
    snowflake join. nation/region are fixed-cardinality (25/5 rows at
    ANY sf) so they carry explicit broadcast hints; supplier scales with
    sf and joins unhinted (AQE broadcasts while it measures small, falls
    back to shuffle at scale). The c_nationkey = s_nationkey residual —
    the "local" in local supplier — rides the lineitem join rather than
    forming its own join pair, so no extra exchange."""
    t = Tables(spark, sf_dir)
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    ords = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    return (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            t.supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "report_large_orders",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           SUM(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING SUM(l_quantity) > 350
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def report_large_orders(spark, sf_dir):
    """TPC-H Q18: customers with very large orders. The HAVING subquery
    becomes a pre-aggregated semi-join input: lineitem aggregates to
    per-order quantity FIRST (two-phase, map-side partial), the >350
    filter shrinks it to a handful of keys, and that small set semi-joins
    back — AQE broadcasts it, so the big lineitem side is scanned twice
    but shuffled on l_orderkey only once (both aggs share the key)."""
    t = Tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 350)
        .select("l_orderkey")
    )
    li = t.lineitem.join(big.withColumnRenamed("l_orderkey", "bk"),
                         F.col("l_orderkey") == F.col("bk"), "left_semi")
    return (
        li.join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer.select("c_custkey", "c_name"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
    )


@query(
    "report_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(ANY_VALUE(c_acctbal), 2) AS c_acctbal
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def report_returned_items(spark, sf_dir):
    """TPC-H Q10: top customers by returned-item revenue. returnflag and
    the date window push to their scans; nation broadcasts (25 rows
    always); the top-20 is TakeOrderedAndProject with a deterministic
    c_custkey tie-break."""
    t = Tables(spark, sf_dir)
    ords = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    li = t.lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.customer.select("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.round(F.any_value("c_acctbal"), 2).alias("c_acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "report_market_share",
    oracle="""
    WITH asia_rev AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n_name
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA')
    SELECT o_year,
           ROUND(SUM(CASE WHEN n_name = 'NATION_9' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share,
           ROUND(SUM(volume), 2) AS total_volume
    FROM asia_rev
    GROUP BY o_year
    """,
)
def report_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's supplier revenue
    per year. The share is a conditional-sum ratio computed inside ONE
    two-phase aggregate — no second pass over the join output, no self
    join. nation/region broadcast (fixed cardinality); supplier and the
    facts join unhinted."""
    t = Tables(spark, sf_dir)
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(t.orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            volume.alias("volume"),
            "n_name",
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("n_name") == "NATION_9", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
    )


@query(
    "report_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def report_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    window. The scalar max is a broadcast 1-row aggregate over the
    per-supplier revenue, joined back as a filter — NOT a rank window:
    a partition-less window serializes every supplier through one task,
    and supplier count scales with sf. Catalyst does not materialize
    CTEs, so the rev branch plans twice (two filtered, fully-parallel
    lineitem scans — the cheaper tradeoff; plan test pins the pushed
    filter on both). Rounding happens before the max comparison on both
    sides so ties are decided on identical values."""
    t = Tables(spark, sf_dir)
    rev = (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    top = (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
    )
    return (
        t.supplier.select("s_suppkey", "s_name")
        .join(top, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "report_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def report_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: orders with at least one late-shipping line item,
    counted by priority. The correlated EXISTS compiles to a left-semi
    join on l_orderkey with the lateness predicate as a join residual —
    the date window on orders pushes to its scan, and the semi-join
    short-circuits per key (no fan-out, no distinct needed)."""
    t = Tables(spark, sf_dir)
    ords = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t.lineitem.select("l_orderkey", "l_shipdate")
    late = ords.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "report_customer_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders ON c_custkey = o_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def report_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, ... orders.
    The LEFT join keeps zero-order customers (COUNT(o_orderkey) counts
    only matched rows — null-skipping, identical in both engines); the
    distribution is a second tiny agg over the per-customer counts.
    Two shuffles: custkey, then c_count (output bounded by max order
    count)."""
    t = Tables(spark, sf_dir)
    ords = t.orders.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t.customer.select("c_custkey")
        .join(ords, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "report_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type = 'PROMO'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
    """,
)
def report_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: promotional revenue share. One fact-dim join
    (part is sf-scaled: unhinted, AQE decides) and the percentage as
    conditional sums inside a single global aggregate — no second
    pass."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp_ntz"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(t.part.select("p_partkey", "p_type"),
                F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "report_small_quantity_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def report_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue lost to small-quantity orders. The
    correlated per-part AVG subquery becomes a pre-aggregated
    per-partkey threshold table joined back on the equi-key — lineitem
    shuffles on l_partkey once and the tiny threshold side rides the
    same key (AQE broadcasts it when the brand filter makes it small).
    Never a re-scan per outer row."""
    t = Tables(spark, sf_dir)
    brand_parts = t.part.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    thresholds = (
        t.lineitem.groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
        .withColumnRenamed("l_partkey", "t_partkey")
    )
    return (
        t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "report_discounted_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def report_discounted_revenue(spark, sf_dir):
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides. The join stays a plain equi-join on partkey with
    the disjunction as a post-join filter; Catalyst derives the
    single-side implications (l_quantity BETWEEN 1 AND 40, p_size >= 1)
    and pushes them below the join, which is the part of this predicate
    that CAN prune at the scan."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = t.part.select("p_partkey", "p_brand", "p_size")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.where(clause).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@query(
    "report_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_9'))
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def report_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: trade volume between two nations by year and
    direction. The nation table joins TWICE under different roles (both
    broadcast — fixed cardinality); the two-direction disjunction is a
    residual on the joined pair, and the year split happens in the
    grouping, not a second scan."""
    t = Tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    pair_ok = (
        (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_9"))
    return (
        li.join(t.supplier.select("s_suppkey", "s_nationkey"),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(pair_ok)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "report_dormant_accounts",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_custs,
           ROUND(SUM(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n_name
    """,
)
def report_dormant_accounts(spark, sf_dir):
    """TPC-H Q22 shape: high-balance customers with no recent orders —
    the sales-opportunity report. The scalar AVG subquery becomes a
    1-row aggregate cross-joined into the filter (one tiny broadcast,
    no second correlated scan); NOT EXISTS compiles to a left-anti join
    against the date-filtered orders."""
    t = Tables(spark, sf_dir)
    avg_bal = (
        t.customer.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    recent = t.orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        t.customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "report_product_profit",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity) * 100) AS BIGINT))
                 / 100.0, 2) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def report_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and
    order year (cost modeled from p_retailprice — the synthetic schema
    carries no partsupp). The p_name LIKE filter lands on the part
    scan BEFORE its join, so only matching parts flow into the
    fact-side joins; nation broadcasts (25 rows, fixed); part/supplier
    /orders join hint-free on their keys — AQE broadcasts the filtered
    part side when it measures small. Profit is rounded to integer
    CENTS per row before summing (both engines compute the identical
    row-level double, so the longs match and the sum is exact,
    order-independent — a ROUND(SUM(double)) form diverged on a
    half-cent boundary at sf0.01)."""
    t = Tables(spark, sf_dir)
    parts = t.part.where(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    profit = F.round(
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
            - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
        )
        * 100
    ).cast("long")
    return (
        t.lineitem.join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            t.supplier.select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            t.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit) / 100.0, 2).alias("profit"))
    )


@query(
    "report_priority_shipping",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def report_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape: how many high- vs low-priority orders shipped
    per line status in a year (the schema has no l_shipmode; line
    status plays its role). The date window is applied on lineitem
    BEFORE the join so it reaches the parquet scan; the conditional
    counts are integer SUM(CASE WHEN)s — exact, order-independent —
    and the single groupBy aggregates two-phase over a 2-row key
    space."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linestatus")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            t.orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "report_waiting_suppliers",
    oracle="""
    SELECT s_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE l1.l_returnflag = 'R'
      AND o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def report_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: suppliers who were the SOLE returned-flag line
    in a finished multi-supplier order (the schema has no receipt/
    commit dates; l_returnflag='R' plays the late-delivery role). The
    two correlated subqueries compile to a left-semi self-join (some
    other supplier in the order) and a left-anti self-join (no OTHER
    supplier returned) on l_orderkey — both hash-partitioned on a
    high-cardinality key, never a per-row rescan. The anti side's
    suppkey inequality rides the join condition."""
    t = Tables(spark, sf_dir)
    l1 = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(
            t.orders.where(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .drop("o_orderkey")
    )
    l2 = t.lineitem.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = t.lineitem.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    )
    waiting = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(
            t.supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@query(
    "report_parts_supplier_count",
    oracle="""
    SELECT p_brand, p_type,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type <> 'PROMO'
      AND p_size BETWEEN 1 AND 25
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY p_brand, p_type
    """,
)
def report_parts_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: how many distinct (non-blacklisted) suppliers
    can ship each surviving part class. The NOT IN subquery compiles
    to a left-anti join against the low-balance suppliers (a filtered
    dimension — no hint, AQE broadcasts it); part filters land on the
    part scan; COUNT(DISTINCT) runs as the standard two-shuffle
    expand/partial plan on the (brand, type) key."""
    t = Tables(spark, sf_dir)
    parts = t.part.where(
        (F.col("p_type") != "PROMO") & F.col("p_size").between(1, 25)
    ).select("p_partkey", "p_brand", "p_type")
    blacklist = t.supplier.where(F.col("s_acctbal") < 1000).select("s_suppkey")
    return (
        t.lineitem.select("l_partkey", "l_suppkey")
        .join(blacklist, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "report_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                          AS BIGINT)) / 100.0, 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def report_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: revenue a blanket discount change would have moved —
    one scan, three pushed predicates, one global sum. The whole query
    is a single PushedFilters parquet scan feeding a 1-row partial/
    final aggregate; no exchange carries more than one row per
    partition. The per-row product is rounded to integer cents BEFORE
    summing (l_extendedprice * l_discount is the same IEEE double in
    both engines, so the cents longs match and the sum is
    order-independent — the report_product_profit discipline)."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.round(F.col("l_extendedprice") * F.col("l_discount") * 100).cast(
        "long"
    )
    return li.agg(F.round(F.sum(cents) / 100.0, 2).alias("revenue"))


@query(
    "report_min_cost_supplier",
    oracle="""
    WITH spc AS (
      SELECT l_suppkey, l_partkey,
             MIN(l_extendedprice / l_quantity) AS supply_cost
      FROM lineitem
      GROUP BY l_suppkey, l_partkey
    ),
    eu AS (
      SELECT s_suppkey, s_acctbal, s_name, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost
    FROM part
    JOIN spc ON p_partkey = l_partkey
    JOIN eu  ON l_suppkey = s_suppkey
    WHERE p_size = 15 AND p_type = 'STANDARD'
      AND supply_cost = (
        SELECT MIN(s2.supply_cost)
        FROM spc s2 JOIN eu e2 ON s2.l_suppkey = e2.s_suppkey
        WHERE s2.l_partkey = p_partkey)
    """,
)
def report_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier(s)
    offering it at minimum cost. The synthetic schema has no partsupp,
    so supply cost derives from observed sales — MIN(l_extendedprice /
    l_quantity) per (supplier, part), the Q16 reshaping pattern
    (reports.py:704). The correlated MIN subquery compiles to a window
    MIN over p_partkey on the already-filtered candidate set — one
    extra exchange on a high-cardinality key instead of a per-row
    rescan; the region/nation dims broadcast. The row-level division
    is the identical IEEE double in both engines and MIN is order-free,
    so equality with the window MIN is hash-exact. Ties (several
    suppliers at the exact minimum) are all emitted, as in Q2."""
    t = Tables(spark, sf_dir)
    spc = (
        t.lineitem.groupBy("l_suppkey", "l_partkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supply_cost"
            )
        )
    )
    eu = (
        t.supplier.select("s_suppkey", "s_acctbal", "s_name", "s_nationkey")
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                t.region.where(F.col("r_name") == "EUROPE").select("r_regionkey")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    parts = t.part.where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    cand = (
        spc.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
    )
    w_min = W.partitionBy("p_partkey")
    return (
        cand.withColumn("__min_cost", F.min("supply_cost").over(w_min))
        .where(F.col("supply_cost") == F.col("__min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost"
        )
    )


@query(
    "report_important_stock",
    oracle="""
    WITH ps AS (
      SELECT l_partkey,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS val_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
    )
    SELECT l_partkey AS p_partkey,
           ROUND(SUM(val_cents) / 100.0, 2) AS part_value
    FROM ps
    GROUP BY l_partkey
    HAVING SUM(val_cents) * 400 > (SELECT SUM(val_cents) FROM ps)
    """,
)
def report_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts representing a significant share of one
    nation's traded value (no partsupp — value derives from lineitem
    sales through NATION_3 suppliers, the Q16 reshaping). The scalar
    total is the SUM of the per-part sums — a 1-row aggregate of the
    grouped output, broadcast back into the HAVING filter (the Q22
    pattern), so lineitem is scanned once per branch and never
    rescanned per row. Row values integerize to cents before ANY sum
    and the share test stays in BIGINTs (sum*400 > total, i.e. share
    > 0.25%) — no double comparison anywhere, hash-exact by
    construction."""
    t = Tables(spark, sf_dir)
    nat = t.nation.where(F.col("n_name") == "NATION_3").select("n_nationkey")
    supp = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    part_sums = (
        t.lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "__val_sum"
            )
        )
    )
    total = part_sums.agg(F.sum("__val_sum").alias("__total"))
    return (
        part_sums.crossJoin(F.broadcast(total))
        .where(F.col("__val_sum") * 400 > F.col("__total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("__val_sum") / 100.0, 2).alias("part_value"),
        )
    )


@query(
    "report_excess_inventory",
    oracle="""
    WITH sp AS (
      SELECT l_suppkey,
             SUM(l_quantity) AS total_qty,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                       AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_1997
      FROM lineitem
      WHERE l_partkey IN
            (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN
          (SELECT l_suppkey FROM sp
           WHERE qty_1997 > 0 AND total_qty > 2 * qty_1997)
    """,
)
def report_excess_inventory(spark, sf_dir):
    """TPC-H Q20 shape: NATION_3 suppliers holding excess stock of
    'small' parts. Availability has no partsupp source, so the proxy is
    observed flow — a supplier has excess when their ALL-TIME shipped
    quantity of a part is more than twice what they shipped in 1997
    (and they did ship it in 1997, mirroring Q20's correlated year
    filter). The nested IN chain compiles to semi-joins end to end:
    part names filter lineitem by left-semi (AQE broadcasts the
    filtered part list), the per-(supplier, part) conditional sums are
    one hash agg, and qualifying suppliers semi-join back into the
    nation-filtered supplier dim. Quantities are integral doubles, so
    every sum and the 2x comparison are exact."""
    t = Tables(spark, sf_dir)
    small_parts = t.part.where(F.col("p_name").like("small%")).select("p_partkey")
    in_1997 = (
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    sp = (
        t.lineitem.select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(F.when(in_1997, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1997"
            ),
        )
        .where((F.col("qty_1997") > 0) & (F.col("total_qty") > 2 * F.col("qty_1997")))
        .select("l_suppkey")
    )
    nat = t.nation.where(F.col("n_name") == "NATION_3").select("n_nationkey")
    return (
        t.supplier.join(
            F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(sp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
