"""Seen-delta compaction + bucket-pruned probe (SnapshotStore).

VERDICT r1 item 5: a long crawl must not pay an O(rounds) delta union
per probe/resume, and a cold probe must reach the store with the
candidate buckets pushed down as partition filters."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import scenario
from node_crawler_spark.sources.store import SnapshotStore


def _seen(spark, res):
    return sorted((r.seq, r.url) for r in res.seen(spark).collect())


def test_compaction_preserves_seen_and_caps_fanin(spark, tmp_path):
    s = scenario("chain4")
    pages, http = s.dfs(spark)
    base = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "plain"))

    cfg = CrawlConfig(**{**s.cfg.__dict__, "compact_every": 2})
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "compact"))
    assert _seen(spark, res) == _seen(spark, base)

    store = SnapshotStore(str(tmp_path / "compact"))
    w = store.compaction_round()
    assert w is not None and w >= 2
    # the compacted view reads the base + only post-watermark deltas:
    # no pre-watermark rounds/ directories appear in its input files
    files = store.read_seen(spark).inputFiles()
    assert any("seen_base" in f for f in files)
    for r in range(w + 1):
        assert not any(f"r={r:06d}" in f for f in files), (
            f"round {r} delta still read after compaction to {w}"
        )
    # the delta log itself is intact (resume / point-in-time reads)
    assert store.read_union(spark, "seen_delta", upto=w).count() > 0


def test_bucket_pruned_probe_plan_and_results(spark, tmp_path):
    s = scenario("chain4")
    pages, http = s.dfs(spark)
    cfg = CrawlConfig(**{**s.cfg.__dict__, "compact_every": 3})
    run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "c"))
    store = SnapshotStore(str(tmp_path / "c"))

    full = store.read_seen(spark)
    urls = [r.url for r in full.select("url").limit(3).collect()]
    bks = sorted(
        r.b
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(SnapshotStore.bucket_of(F.col("url"), store.seen_buckets).alias("b"))
        .distinct()
        .collect()
    )
    pruned = store.read_seen_pruned(spark, bks)
    # results: pruned view == full view restricted to those buckets,
    # and every probe url is served by it
    want = sorted(r.url for r in full.where(F.col("bucket").isin(bks)).collect())
    got = sorted(r.url for r in pruned.collect())
    assert got == want
    assert set(urls) <= set(got)
    # plan: the bucket filter lands as a parquet PartitionFilter
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200], plan


def test_probe_from_store_crawl_identical(spark, tmp_path):
    s = scenario("chain4")
    pages, http = s.dfs(spark)
    base = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "b"))
    cfg = CrawlConfig(
        **{**s.cfg.__dict__, "probe_from_store": True, "compact_every": 2}
    )
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "p"))
    assert _seen(spark, res) == _seen(spark, base)
    crawled_a = sorted((r.seq, r.url) for r in base.crawled(spark).collect())
    crawled_b = sorted((r.seq, r.url) for r in res.crawled(spark).collect())
    assert crawled_a == crawled_b
