"""Streaming heavy hitters — the count-min sketch as a Structured
Streaming operator.

A live crawler needs "which domains/urls are hot RIGHT NOW" without
per-key state: at 10^10 urls a per-url streaming counter is not an
option, but the CMS counter matrix is CMS_D×CMS_W cells TOTAL,
regardless of key cardinality, and merges across micro-batches by
cell-wise integer addition — the mergeable-summaries property
(sk_cms_heavy's batch twin; same portable md5 hash family, so the
streamed matrix is comparable cell-for-cell with the batch matrix).

Design: ``foreachBatch`` folds each micro-batch's partial counter
matrix into a state directory as an APPENDED parquet partial tagged
with the batch id. Appends are idempotent under Spark's foreachBatch
replay semantics (a re-run batch re-writes identical (r,c,batch_id)
rows; the reader collapses them with max-per-batch before summing),
so the merged matrix is exactly-once without any read-modify-write
on the hot path — each micro-batch costs ONE map-side-combinable
aggregate into ≤ CMS_D·CMS_W rows plus one tiny append.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.queries import CMS_D, CMS_W, _cms_col
from node_crawler_spark.streaming._state import read_state_or_empty


def cms_partial(df: DataFrame, key: str = "url") -> DataFrame:
    """The micro-batch's partial counter matrix: (r, c, cnt)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
    return (
        df.select(F.col(key).alias("k"), rows)
        .select("r", _cms_col(F.col("k"), F.col("r")).alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def start_cms_query(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "url",
):
    """Fold the stream into the CMS state directory, one partial per
    micro-batch."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_partial(batch_df, key)
            .withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("append")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"cms_heavy_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )


def cms_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """The merged counter matrix: collapse replayed partials
    (max per (r,c,batch_id) — identical rows, so max == the value),
    then cell-wise sum across batches. Empty (not an error) when
    queried before the first micro-batch."""
    return (
        read_state_or_empty(
            spark, state_dir, "r int, c bigint, cnt bigint, batch_id bigint"
        )
        .groupBy("r", "c", "batch_id")
        .agg(F.max("cnt").alias("cnt"))
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    spark: SparkSession, state_dir: str, keys: DataFrame, key: str = "k"
) -> DataFrame:
    """Point-query the merged matrix: per key, the min over the D row
    counters — the CMS estimate (never an underestimate)."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(CMS_D - 1))).alias("r")
    cells = keys.select(F.col(key).alias("k"), rows).select(
        "k", "r", _cms_col(F.col("k"), F.col("r")).alias("c")
    )
    return (
        cells.join(cms_counters(spark, state_dir), ["r", "c"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_estimate"))
    )
