"""Iterative graph analytics over edge DataFrames.

Web-crawl curation pipelines score domains by link-graph centrality
(Common Crawl publishes harmonic-centrality / PageRank rankings, and
quality-filter recipes weight documents by their domain's rank), so a
training-data engine needs a distributed PageRank over an edge table —
the iterative-algorithm counterpart of dedup.connected_components.

Dataflow per iteration (classic power iteration, Page 1999; the Spark
shape follows the standard Pregel-style contribs pattern every engine
uses): ranks join edges on src (hash-partitioned on node id), per-dst
contribution sums via map-side-combinable agg, dangling mass folded
back uniformly. Per-iteration driver traffic is ONE scalar (the
dangling-mass sum) — control plane, same discipline as k-means'
centroid collect. Lineage is truncated every few rounds
(localCheckpoint, same as connected_components) so the plan doesn't
grow with iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 8,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Ranks after `iterations` rounds of the damped power iteration
    on the directed graph `edges`. Returns (node, rank); ranks sum to
    1 (dangling nodes redistribute uniformly). Deterministic up to FP
    summation order — pytest pins equality to a numpy model at 1e-9.

    Scale shape: nodes/out-degrees/edge table are computed once and
    persisted; each iteration is one equi-join on src + one hash agg
    on dst (both partitioned on high-cardinality node ids) + a 1-row
    dangling-mass agg. Nothing driver-side scales with the graph.
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy(F.col(src_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__out_deg")
    )
    e = (
        edges.select(F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst"))
        .join(out_deg, "__src")
        .persist()
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e["__src"] == ranks["node"])
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") / F.col("__out_deg")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__contrib"))
        )
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg["__src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("__contrib"), F.lit(0.0)) + F.lit(dangling / n))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    out = ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    e.unpersist()
    return out
