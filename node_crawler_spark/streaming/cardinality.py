"""Streaming distinct-count — the HyperLogLog sketch as a Structured
Streaming operator (sk_hll_distinct's streaming face, beside
heavy_hitters.py's CMS face).

"How many distinct URLs has each domain contributed so far?" with
per-key streaming state would need one entry per URL; the HLL file is
HLL_M registers per group FOREVER, and merges by register-wise MAX —
which is IDEMPOTENT, so unlike the CMS's additive merge this face
needs no batch-id dedup at all: a replayed micro-batch's appended
partial max-folds to the identical register file.

Same portable md5 hash family as the batch query, so the streamed
register file is comparable register-for-register with the batch one.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.queries import HLL_M, HLL_RHO_CAP, _HLL_NUM, _phash
from node_crawler_spark.streaming._state import read_state_or_empty


def hll_partial(df: DataFrame, key: str = "url", group: str = "g") -> DataFrame:
    """The micro-batch's partial register file: (g, bucket, r)."""
    h = df.select(
        F.col(group).alias("g"), _phash(F.col(key), "hll").alias("hv")
    )
    rb = h.select(
        "g",
        (F.col("hv") % HLL_M).alias("bucket"),
        F.expr(
            f"least(CASE WHEN hv DIV {HLL_M} = 0 THEN 53 "
            f"ELSE 53 - length(bin(hv DIV {HLL_M})) END, {HLL_RHO_CAP})"
        ).alias("r"),
    )
    return rb.groupBy("g", "bucket").agg(F.max("r").alias("r"))


def start_hll_query(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    key: str = "url",
    group: str = "g",
):
    """Fold the stream into the HLL state directory, one partial
    register file per micro-batch (append-only; max-merge on read)."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        (
            hll_partial(batch_df, key, group)
            .coalesce(1)
            .write.mode("append")
            .parquet(state_dir)
        )

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"hll_distinct_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )


def hll_registers(spark: SparkSession, state_dir: str) -> DataFrame:
    """The merged register file: register-wise MAX across partials.
    Empty (not an error) when queried before the first micro-batch."""
    return (
        read_state_or_empty(spark, state_dir, "g string, bucket bigint, r int")
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(spark: SparkSession, state_dir: str) -> DataFrame:
    """Per-group raw-HLL cardinality estimate from the merged
    registers — the same exact-BIGINT harmonic sum + single IEEE
    division as the batch query (no ln() small-range correction, same
    rationale)."""
    regs = hll_registers(spark, state_dir)
    sketch = regs.groupBy("g").agg(
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_CAP} - r)")).alias("s_nonempty"),
        F.count(F.lit(1)).alias("m_used"),
    )
    s_total = F.col("s_nonempty") + (F.lit(HLL_M) - F.col("m_used")) * F.lit(
        1 << HLL_RHO_CAP
    )
    return sketch.select(
        "g",
        F.round(F.lit(_HLL_NUM) / s_total.cast("double"), 2).alias(
            "hll_estimate"
        ),
    )
