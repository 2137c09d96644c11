"""Streaming KMV distinct-count — the theta-sketch face, completing
the streaming sketch set (CMS frequency, HLL cardinality, histogram
quantiles, KMV theta).

The KMV merge rule is "keep the K smallest hash values of the union",
and because the portable hash is a pure function of the key, a
replayed micro-batch contributes the SAME values — the union-distinct
absorbs it, so like the HLL face this needs no batch-id bookkeeping.
Per-batch state is ≤ K values per group; merged state is ≤ K·batches
rows on disk, collapsed to K on read."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from node_crawler_spark.queries import _KMV_SPACE, KMV_K, _phash
from node_crawler_spark.streaming._state import read_state_or_empty


def kmv_partial(df: DataFrame, key: str = "url", group: str = "g") -> DataFrame:
    """The micro-batch's partial sketch: the K smallest distinct
    portable-hash values per group."""
    h = df.select(
        F.col(group).alias("g"), _phash(F.col(key), "kmv").alias("hv")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("g").orderBy("hv"))
    return h.withColumn("rn", rn).where(F.col("rn") <= KMV_K).select("g", "hv")


def start_kmv_query(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "url",
    group: str = "g",
):
    """Fold the stream into the KMV state directory, one partial per
    micro-batch (append-only; distinct + re-rank on read)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            kmv_partial(batch_df, key, group)
            .coalesce(1)
            .write.mode("append")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"kmv_distinct_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )


def kmv_values(spark: SparkSession, state_dir: str) -> DataFrame:
    """The merged sketch: K smallest distinct values of the union.
    Empty (not an error) when queried before the first micro-batch."""
    h = read_state_or_empty(spark, state_dir, "g string, hv bigint").distinct()
    rn = F.row_number().over(Window.partitionBy("g").orderBy("hv"))
    return h.withColumn("rn", rn).where(F.col("rn") <= KMV_K).select("g", "hv")


def kmv_estimate(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-group distinct-count estimate: (k−1)·space / kth_hash —
    identical to the batch query's estimator."""
    kth = (
        kmv_values(spark, state_dir)
        .groupBy("g")
        .agg(F.max("hv").alias("kth_hash"), F.count(F.lit(1)).alias("k_used"))
    )
    return kth.select(
        "g",
        "k_used",
        F.round(
            (F.col("k_used") - 1).cast("double")
            * F.lit(float(_KMV_SPACE))
            / F.col("kth_hash"),
            2,
        ).alias("kmv_estimate"),
    )
