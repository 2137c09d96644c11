"""Anchor-text aggregation over the crawl's link graph — the classic
web-corpus feature beyond the reference (crawler.js:93-107 collects
only hrefs; the text BETWEEN the anchor tags is what search engines
and LLM-pretraining pipelines aggregate per target document).

``anchor_edges`` turns the page store into (src, dst, text) rows: the
gzip-aware decode + anchor-pair parse + link resolution run fused in
ONE mapInPandas Arrow pass (the decode_extract_resolve discipline —
body bytes cross the JVM↔Python socket once), hrefs resolve with the
same urlkit semantics the crawl itself uses, and fragments strip so
dst keys the document, not a section.

``anchor_texts`` aggregates the edges per target: reference count,
distinct source count, and a deterministic sample of distinct anchor
texts (sorted, capped at ``max_texts``) — the per-dst state is bounded
regardless of in-degree, so a 10^8-in-link hub costs one hash-agg cell,
not an unbounded collect_list. Both are plain DataFrames; join
``res.seen(spark)`` to restrict to crawled targets.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_SCHEMA = "src string, dst string, text string"


def _decode(raw, gzipped_hint: bool | None = None) -> str:
    import gzip as _gzip

    if raw is None:
        return ""
    raw = bytes(raw)
    if gzipped_hint or raw[:2] == b"\x1f\x8b":
        try:
            raw = _gzip.decompress(raw)
        except OSError:
            return ""
    return raw.decode("utf-8", errors="replace")


def anchor_edges(pages: DataFrame) -> DataFrame:
    """(src, dst, text) anchor edges from the latest snapshot of every
    page. Fragment-stripped, urlkit-resolved; empty anchor text is
    kept as '' (a bare image link is still a reference)."""
    from pyspark.sql import Window

    from node_crawler_spark.functions.html import extract_anchor_pairs_py
    from node_crawler_spark.functions.urlkit import resolve_many

    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc_nulls_last())
    latest = (
        pages.select("url", "warc_ts", "html")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "warc_ts")
    )

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs, dsts, texts = [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                pairs = extract_anchor_pairs_py(_decode(html))
                if not pairs:
                    continue
                resolved = resolve_many(url, [h for h, _ in pairs])
                for dst, (_h, text) in zip(resolved, pairs):
                    srcs.append(url)
                    dsts.append(dst.split("#", 1)[0])
                    texts.append(text)
            yield pd.DataFrame(
                {
                    "src": pd.array(srcs, dtype="string"),
                    "dst": pd.array(dsts, dtype="string"),
                    "text": pd.array(texts, dtype="string"),
                }
            )

    return latest.mapInPandas(parse_batches, EDGE_SCHEMA)


def anchor_texts(pages: DataFrame, max_texts: int = 20) -> DataFrame:
    """Per-target anchor-text rollup: (url, n_refs, n_sources, texts)
    where texts is the first ``max_texts`` distinct non-empty anchor
    texts in sort order. The cap is applied BEFORE the collect — a
    distinct + per-dst row_number window keeps ≤ max_texts rows per
    target, so a 10^8-in-link hub never materializes an unbounded
    list in any aggregation buffer (the sliced-collect_set shortcut
    would). Counts are a separate plain hash aggregate; both sides
    share the final dst join key."""
    from pyspark.sql import Window

    e = anchor_edges(pages).localCheckpoint(eager=False)
    stats = e.groupBy(F.col("dst").alias("url")).agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.count_distinct("src").alias("n_sources"),
    )
    rn = F.row_number().over(Window.partitionBy("dst").orderBy("text"))
    capped = (
        e.where(F.col("text") != "")
        .select("dst", "text")
        .distinct()
        .withColumn("_rn", rn)
        .where(F.col("_rn") <= max_texts)
    )
    texts = capped.groupBy(F.col("dst").alias("url")).agg(
        F.sort_array(F.collect_list("text")).alias("texts")
    )
    return stats.join(texts, "url", "left").select(
        "url",
        "n_refs",
        "n_sources",
        F.coalesce("texts", F.array().cast("array<string>")).alias("texts"),
    )
