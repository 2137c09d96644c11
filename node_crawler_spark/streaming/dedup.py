"""Streaming URL dedup — the SEEN-SET as a Structured Streaming
operator.

A live crawler's link discoveries arrive as a stream; the first
occurrence of each url must pass and every later one must drop. This
face uses the engine's two standard tools:

  * ``dropDuplicatesWithinWatermark("url")`` — Spark's stateful
    streaming dedup. State is keyed by url and EXPIRES once the
    watermark passes the key's event time, so memory is bounded by
    the watermark horizon instead of growing with the crawl — at
    10^10 urls an unbounded streaming state is not an option. Within
    the horizon the dedup is exact.
  * the batch seen-set (bloom/cuckoo sidecar + exact anti-join)
    remains the source of truth ACROSS horizons: the streaming dedup
    is the front-line filter that keeps duplicate floods (hot pages
    re-linked everywhere) from ever reaching the committed store.

The combination mirrors the batch engine's two-tier probe (approx
prefilter + exact join), transplanted to event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_frontier_stream(
    links: DataFrame,
    watermark: str = "10 minutes",
) -> DataFrame:
    """``links`` is a streaming DataFrame with at least
    (url string, discovered_ts timestamp). Returns the stream with
    only the first occurrence of each url within the watermark
    horizon."""
    return links.withWatermark(
        "discovered_ts", watermark
    ).dropDuplicatesWithinWatermark(["url"])
