"""Structured Streaming: seed-inbox ingestion (canonicalize + gate +
dedup in foreachBatch) with availableNow draining."""

from __future__ import annotations

import os

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.streaming.seeds import read_inbox, start_seed_ingest


def _write_seed_file(d, name, urls):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as fh:
        fh.write("\n".join(urls) + "\n")


def test_seed_ingest_drains_and_dedups(spark, tmp_path):
    seeds_dir = str(tmp_path / "seeds")
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")

    _write_seed_file(seeds_dir, "a.txt", [
        "http://www.site.test",          # canonicalizes → trailing slash
        "http://www.site.test/page",
        "http://WWW.Site.test/page",     # same after canonicalization
        "http://www.site.test/private/x",
    ])
    cfg = CrawlConfig(exclude_patterns=("/private",))
    q = start_seed_ingest(spark, seeds_dir, inbox, ckpt, cfg, available_now=True)
    q.awaitTermination(120)

    rows = {r.url for r in read_inbox(spark, inbox).collect()}
    assert rows == {"http://www.site.test/", "http://www.site.test/page"}

    # second drop: dup of existing + one new url
    _write_seed_file(seeds_dir, "b.txt", [
        "http://www.site.test/page",
        "http://www.site.test/new",
    ])
    q = start_seed_ingest(spark, seeds_dir, inbox, ckpt, cfg, available_now=True)
    q.awaitTermination(120)

    inbox_df = read_inbox(spark, inbox)
    urls = [r.url for r in inbox_df.collect()]
    assert sorted(urls) == [
        "http://www.site.test/",
        "http://www.site.test/new",
        "http://www.site.test/page",
    ], "no duplicates across micro-batches"
