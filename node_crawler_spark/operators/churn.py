"""Snapshot churn — content-change detection over the page store's
``warc_ts`` history, for incremental re-crawl scheduling (the feature
a repeated crawl wants that the single-shot reference, crawler.js,
has no notion of: its page store is one snapshot deep).

``snapshot_churn`` compares each url's two LATEST snapshots by body
fingerprint: one window pass ranks snapshots per url, one hash
aggregate on the same key folds them to (url, n_snapshots, latest_ts,
changed) — same-key window + groupBy share a single shuffle. The
fingerprint is md5 over the RAW stored bytes (gzip'd bodies compare
as stored; a re-encoded identical body counts as change — documented,
cheap, and scan-shaped at any store size).

``changed_urls`` filters to urls worth re-fetching: body changed
between the two latest snapshots. CLI ``--seeds-changed`` feeds them
through the NORMAL queue-gate chain as extra seeds (no trust bypass),
closing the change-driven re-crawl loop the same way
``--ranks-from-store`` closes the rank-driven one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_churn(pages: DataFrame) -> DataFrame:
    """(url, n_snapshots, latest_ts, changed) per url in the store.

    ``changed`` is true iff the url has ≥2 snapshots and the two
    latest bodies differ byte-wise. Deterministic tie-break on equal
    warc_ts: fingerprint desc (a stable total order either way)."""
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(), F.col("fp").desc()
    )
    ranked = (
        pages.select(
            "url", "warc_ts", F.md5(F.col("html")).alias("fp")
        )
        .withColumn("_rn", F.row_number().over(w))
    )
    return (
        ranked.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            F.max(F.when(F.col("_rn") == 1, F.col("warc_ts"))).alias(
                "latest_ts"
            ),
            F.max(F.when(F.col("_rn") == 1, F.col("fp"))).alias("_fp1"),
            F.max(F.when(F.col("_rn") == 2, F.col("fp"))).alias("_fp2"),
        )
        .select(
            "url",
            "n_snapshots",
            "latest_ts",
            (
                F.col("_fp2").isNotNull()
                & (F.col("_fp1") != F.col("_fp2"))
            ).alias("changed"),
        )
    )


def changed_urls(pages: DataFrame) -> DataFrame:
    """Urls whose latest snapshot differs from the previous one —
    the re-crawl candidates."""
    return snapshot_churn(pages).where(F.col("changed")).select("url")


def changed_tuples(changed: DataFrame) -> list[str]:
    """Collect changed urls into a sorted seed list. Driver-side by
    design — seeds are a driver-side list today; at huge url counts
    feed the DataFrame into the frontier union instead."""
    return sorted(r.url for r in changed.collect())
