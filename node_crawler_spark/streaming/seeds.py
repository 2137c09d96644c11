"""Structured Streaming seed ingestion.

The reference accepts new urls at any time via ``crawler.queue()``
(crawler.js:576-618). The batch engine's analog: a stream of seed
files (one url per line, e.g. dropped by an upstream discovery
system) continuously canonicalized, gated (F3/F4 + robots) and
deduplicated into a ``seed_inbox`` table that the driver folds into
the frontier at the next round boundary.

Shape: ``readStream.text`` → canonicalize/gates (same kernels as the
batch path) → ``foreachBatch`` ( dedup against seen + inbox, assign
arrival order, append ). foreachBatch is the right tool because the
dedup needs an anti-join against *tables* (seen state, existing
inbox), which pure streaming operators cannot express without keeping
the whole seen set as stream state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.functions.urlkit import canonicalize_url


def _gate_seeds(batch: DataFrame, cfg: CrawlConfig) -> DataFrame:
    out = batch.select(
        canonicalize_url(F.trim(F.col("value"))).alias("url"),
        F.col("_arrival").alias("arrival"),
    ).where(F.col("url") != "")
    for pat in cfg.exclude_patterns:
        out = out.where(~F.col("url").rlike("(?i)" + pat))
    if cfg.robots:
        from node_crawler_spark.operators.robots import robots_gate

        out = robots_gate(out, cfg.robots, "url")
    return out


def start_seed_ingest(
    spark: SparkSession,
    seeds_dir: str,
    inbox_dir: str,
    checkpoint_dir: str,
    cfg: CrawlConfig | None = None,
    seen: DataFrame | None = None,
    available_now: bool = True,
):
    """Start the ingestion stream; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in seeds_dir and
    stops (test/batch-catchup mode); False runs continuously.
    """
    cfg = cfg or CrawlConfig()

    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 64)
        .load(seeds_dir)
        .withColumn("_arrival", F.current_timestamp())
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        gated = _gate_seeds(batch, cfg)
        # within-batch first-wins (D4→D1 semantics: first occurrence keeps)
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy("arrival")
        gated = gated.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") == 1
        ).drop("_rn")
        # against existing inbox + seen state
        bspark = batch.sparkSession
        if os.path.isdir(inbox_dir) and any(
            f.endswith(".parquet") for f in os.listdir(inbox_dir)
        ):
            existing = bspark.read.parquet(inbox_dir).select("url")
            gated = gated.join(existing, "url", "left_anti")
        if seen is not None:
            gated = gated.join(seen.select("url"), "url", "left_anti")
        gated.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            inbox_dir
        )

    writer = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_inbox(spark: SparkSession, inbox_dir: str) -> DataFrame | None:
    if not os.path.isdir(inbox_dir):
        return None
    if not any(f.endswith(".parquet") for f in os.listdir(inbox_dir)):
        return None
    return spark.read.parquet(inbox_dir)
