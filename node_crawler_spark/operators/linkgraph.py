"""Link-graph analytics over the crawl's own output — PageRank as the
canonical iterative-DataFrame workload (Page et al. 1999; the classic
Spark example generalized to the 10^10-edge posture).

Input is the ``crawled`` sink (url, links[]) the driver commits each
round, so ranking runs straight off a finished crawl's store — the
natural consumer is frontier prioritization for the NEXT crawl
(rank-weighted politeness budgets) and corpus weighting for training
data (a page's rank is a quality prior).

Physical design:
  * edges = one explode of the links arrays; ranks/out-degree live in
    (url-keyed) DataFrames. Every iteration is ONE equi-join on src +
    one hash aggregate on dst — both shuffle on the url key, so a
    pre-partitioned edge table (repartition(P, "src"), persisted)
    makes the join side exchange-free after the first iteration, the
    bucketed-pagestore discipline applied to edges.
  * dangling mass (pages with no out-links — errors, leaves) is one
    scalar aggregate per iteration, redistributed uniformly: ranks
    sum to 1 every iteration by construction.
  * lineage is truncated with localCheckpoint every iteration (the
    fetch-loop discipline — an un-truncated 30-iteration plan tree
    compounds exponentially).
  * iterations are a fixed, config-bounded count: rank deltas at
    10^10 nodes are not worth a convergence-test job per iteration;
    callers pick iters for their precision need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def link_edges(crawled: DataFrame) -> DataFrame:
    """(src, dst) edge list from the crawled sink's resolved links
    (duplicate links from one page collapse to one edge, the PageRank
    convention for web graphs)."""
    return (
        crawled.select(F.col("url").alias("src"), F.explode("links").alias("dst"))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    iters: int = 20,
    damping: float = 0.85,
) -> DataFrame:
    """Ranks over the edge list; returns (url, rank) with
    sum(rank) == 1 (uniform teleport + uniform dangling
    redistribution). Deterministic: same graph → same ranks."""
    spark = edges.sparkSession
    p = spark.sparkContext.defaultParallelism

    edges = edges.repartition(p, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("url"))
        .unionByName(edges.select(F.col("dst").alias("url")))
        .distinct()
        .repartition(p, "url")
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iters):
        with_deg = ranks.join(
            out_deg, ranks["url"] == out_deg["src"], "left"
        ).select("url", "rank", "deg")
        dangling = (
            with_deg.where(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        contrib = (
            edges.join(
                with_deg.where(F.col("deg").isNotNull()),
                edges["src"] == with_deg["url"],
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contrib, nodes["url"] == contrib["dst"], "left")
            .select(
                "url",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        old = ranks
        ranks = new_ranks.localCheckpoint()
        old.unpersist()
    return ranks
