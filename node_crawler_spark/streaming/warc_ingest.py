"""Streaming WARC ingestion — tail a directory of CDX index files and
range-read ONLY the newly indexed records each micro-batch.

Crawl archives arrive incrementally (Common Crawl publishes cdx +
warc per segment; a live crawler appends both). The batch reader
(sources/warc.py) is file-per-task; this face instead streams the
INDEX — line-oriented CSV the Structured Streaming file source tracks
exactly-once — and does the byte IO inside ``foreachBatch`` through
the same ``read_warc_by_cdx`` range reader, so:

  * each record's bytes are fetched once, when its index line first
    appears (no re-scan of old WARC files per batch);
  * a killed query resumes from the checkpoint and continues with the
    first unprocessed index file (the file-source log is the lineage);
  * predicate pruning still applies — filter the stream before the
    sink and the dropped records are never read at all.

The pages/http sinks are parquet appends inside foreachBatch:
exactly-once per *index file* under availableNow replays (the file
source never re-offers a committed file); a mid-batch crash can
replay the interrupted batch, the standard foreachBatch at-least-once
caveat — dedup on (url, warc_file, offset) downstream when that
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from node_crawler_spark.sources.warc import (
    CDX_SCHEMA,
    read_warc_by_cdx,
    warc_tables,
)


def cdx_stream(spark: SparkSession, cdx_dir: str) -> DataFrame:
    """readStream over CDX csv lines:
    url, warc_ts, warc_file, offset, length, status_code."""
    return (
        spark.readStream.schema(CDX_SCHEMA)
        .option("pathGlobFilter", "*.csv")
        .csv(cdx_dir)
    )


def start_warc_ingest(
    spark: SparkSession,
    cdx_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Stream newly indexed WARC records into pages/http_meta parquet
    (the crawl-input tables). Returns the StreamingQuery."""
    stream = cdx_stream(spark, cdx_dir)

    def _batch(cdx_batch: DataFrame, _epoch: int) -> None:
        records = read_warc_by_cdx(cdx_batch)
        pages, http = warc_tables(records)
        pages.write.mode("append").parquet(f"{out_dir}/pages")
        http.write.mode("append").parquet(f"{out_dir}/http_meta")

    writer = stream.writeStream.foreachBatch(_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
