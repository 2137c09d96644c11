"""Streaming incremental near-dup dedup — the streaming face of
queries.d_incremental_minhash.

A continuous crawl ingests documents in micro-batches; each batch must
be near-dup-checked against EVERYTHING already ingested before it is
admitted, and the standing index must grow by exactly that batch. The
state is the same two tables the batch query derives on the fly:

  * ``<state>/bands``    — (doc_id, band, bucket) MinHash band index
  * ``<state>/shingles`` — (doc_id, shingle) postings for the exact
    Jaccard rerank

both append-only parquet, deduped with ``distinct()`` on read — the
rows are pure functions of the document text, so a replayed
micro-batch appends byte-identical rows and the distinct absorbs them
(the KMV/HLL replay discipline; no batch-id bookkeeping).

Per batch the fold emits every flagged pair (batch×standing AND
within-batch — so after N batches the flagged set equals the FULL
single-shot near-dup over the union, which the test asserts
pair-for-pair) to an append-only ``dups`` sink with pair order
normalized (doc_a < doc_b); a replayed batch re-emits the same
normalized rows and the reader's distinct absorbs those too.

Scale posture: identical to the batch query — candidates come from
band-bucket collisions against the standing index (O(batch), never
corpus²), the rerank is candidate-bounded, and state grows by O(batch)
per fold.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.queries import (
    MH_JACCARD_PPM,
    _exact_jaccard,
    _minhash_bands,
    _shingles_from,
)
from node_crawler_spark.streaming._state import read_state_or_empty


def _read_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return read_state_or_empty(spark, path, schema).distinct()


def neardup_fold(batch_df: DataFrame, batch_id: int, state_dir: str,
                 dups_dir: str) -> None:
    """Check one micro-batch of (doc_id, text) against the standing
    index, emit flagged pairs, then append the batch to the index."""
    spark = batch_df.sparkSession
    sh_new = _shingles_from(batch_df).localCheckpoint()
    bands_new = _minhash_bands(sh_new).localCheckpoint()
    old_bands = _read_state(
        spark, f"{state_dir}/bands", "doc_id long, band int, bucket string"
    )
    old_sh = _read_state(
        spark, f"{state_dir}/shingles", "doc_id long, shingle string"
    )

    cross = (
        bands_new.alias("a")
        .join(
            old_bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            # a replayed batch is already in the state: never pair a
            # doc with itself
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least("a.doc_id", "b.doc_id").alias("doc_a"),
            F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
        )
    )
    within = (
        bands_new.alias("a")
        .join(
            bands_new.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    pairs = cross.unionByName(within).distinct()
    all_sh = old_sh.unionByName(sh_new).distinct()
    flagged = (
        _exact_jaccard(all_sh, pairs)
        .where(F.col("jaccard_ppm") >= MH_JACCARD_PPM)
        .select("doc_a", "doc_b", "jaccard_ppm")
    )
    flagged.coalesce(1).write.mode("append").parquet(dups_dir)
    bands_new.coalesce(1).write.mode("append").parquet(f"{state_dir}/bands")
    sh_new.coalesce(1).write.mode("append").parquet(f"{state_dir}/shingles")


def start_neardup_query(
    stream: DataFrame,
    state_dir: str,
    dups_dir: str,
    checkpoint_dir: str,
):
    """Fold a (doc_id, text) stream into the incremental near-dup
    index, emitting flagged pairs per micro-batch."""

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        neardup_fold(batch_df, batch_id, state_dir, dups_dir)

    return (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(f"neardup_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )


def neardup_flagged(spark: SparkSession, dups_dir: str) -> DataFrame:
    """All flagged pairs so far (replay-deduped)."""
    return spark.read.parquet(dups_dir).distinct()
