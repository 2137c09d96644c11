"""Streaming quantiles — the equi-width histogram sketch as a
Structured Streaming operator (sk_hist_quantiles' streaming face;
with heavy_hitters.py's CMS and cardinality.py's HLL this gives every
mergeable sketch in the engine a streaming face).

"p50/p99 document length per language so far" with exact streaming
state would need every length seen; the histogram is ≤ HISTQ_BUCKETS
counters per group forever and merges by cell-wise addition, so the
same batch-id-tagged append + collapse-on-read protocol as the CMS
face applies (idempotent under foreachBatch replay)."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from node_crawler_spark.queries import HISTQ_BUCKETS, HISTQ_WIDTH
from node_crawler_spark.streaming._state import read_state_or_empty


def hist_partial(df: DataFrame, value: str = "n_chars", group: str = "g") -> DataFrame:
    """The micro-batch's partial histogram: (g, b, cnt)."""
    return (
        df.select(
            F.col(group).alias("g"),
            F.least(
                (F.col(value) / HISTQ_WIDTH).cast("long"),
                F.lit(HISTQ_BUCKETS - 1),
            ).alias("b"),
        )
        .groupBy("g", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def start_hist_query(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value: str = "n_chars",
    group: str = "g",
):
    """Fold the stream into the histogram state directory, one partial
    per micro-batch, tagged with the batch id (replay-idempotent)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            hist_partial(batch_df, value, group)
            .withColumn("batch_id", F.lit(batch_id))
            .coalesce(1)
            .write.mode("append")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"hist_quantiles_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )


def hist_counters(spark: SparkSession, state_dir: str) -> DataFrame:
    """The merged histogram: collapse replayed partials (max per
    (g,b,batch_id) — identical rows), then cell-wise sum. Empty (not
    an error) when queried before the first micro-batch."""
    return (
        read_state_or_empty(
            spark, state_dir, "g string, b bigint, cnt bigint, batch_id bigint"
        )
        .groupBy("g", "b", "batch_id")
        .agg(F.max("cnt").alias("cnt"))
        .groupBy("g", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_quantiles(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-group p50/p90/p99 estimates from the merged histogram —
    the same integer coverage test (cum·100 ≥ p·n) as the batch
    query, within one bucket width of exact."""
    wcum = Window.partitionBy("g").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy("g")
    c = (
        hist_counters(spark, state_dir)
        .withColumn("cum", F.sum("cnt").over(wcum))
        .withColumn("n", F.sum("cnt").over(wall))
    )

    def est(p):
        return (
            F.min(F.when(F.col("cum") * 100 >= p * F.col("n"), F.col("b"))) + 1
        ) * HISTQ_WIDTH

    return c.groupBy("g").agg(
        F.max("n").alias("n_rows"),
        est(50).alias("p50_est"),
        est(90).alias("p90_est"),
        est(99).alias("p99_est"),
    )
