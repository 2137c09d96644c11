"""Streaming crawl metrics — watermarked windowed counters over the
committed crawl sinks.

A monitoring-plane example of Structured Streaming over the engine's
own output: tail the store's ``crawled`` table (file source picks up
each round's newly committed parquet), bucket pages into event-time
windows of the round commit time, and maintain per-window/type counts
with a watermark bounding state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.functions.urlkit import hostport_col
from node_crawler_spark.sources.store import SnapshotStore  # noqa: F401 (docs)


def crawled_stream(spark: SparkSession, store_root: str, schema: str) -> DataFrame:
    """readStream over every committed round's crawled table."""
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{store_root}/rounds/r=*/crawled")
        .withColumn("_commit_ts", F.current_timestamp())
    )


def windowed_type_counts(crawled: DataFrame, window: str = "1 minute") -> DataFrame:
    """Watermarked tumbling-window page counts by content type."""
    return (
        crawled.withWatermark("_commit_ts", "2 minutes")
        .groupBy(F.window("_commit_ts", window), F.col("type"))
        .agg(
            F.count(F.lit(1)).alias("pages"),
            F.approx_count_distinct("url").alias("approx_urls"),
        )
    )


def start_metrics_query(
    spark: SparkSession, store_root: str, schema: str, checkpoint_dir: str
):
    """Run the windowed counters to an in-memory sink (query name
    ``crawl_metrics``) — poll with
    ``spark.sql('select * from crawl_metrics')``."""
    agg = windowed_type_counts(crawled_stream(spark, store_root, schema))
    return (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("crawl_metrics")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_domain_counts(
    pages: DataFrame,
    window: str = "1 hour",
    allowed_lateness: str = "30 minutes",
) -> DataFrame:
    """EVENT-TIME per-domain page counts over ``warc_ts`` (the
    input_hint timestamp) — tumbling windows with a real watermark, so
    state is bounded and rows arriving more than ``allowed_lateness``
    behind the max seen event time are dropped, never silently
    double-counted. Run in ``append`` mode: a window is emitted
    exactly once, when the watermark passes its end — the contract a
    downstream consumer (alerting, rate caps) needs. At 100 TB-ingest
    scale the state store holds only open windows × domains; closed
    windows are evicted by the same watermark."""
    return (
        pages.withColumn("domain", hostport_col(F.col("url")))
        .withWatermark("warc_ts", allowed_lateness)
        .groupBy(F.window("warc_ts", window).alias("w"), "domain")
        .agg(F.count(F.lit(1)).alias("pages"))
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "domain",
            "pages",
        )
    )
