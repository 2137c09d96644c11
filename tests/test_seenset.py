"""BloomSeenSet (operators/seenset.py) — the D1 scale sidecar.

Contract under test: NO false negatives ever (correctness depends on
it — a bloom-negative row bypasses the exact join), bounded false
positives, no shard hotspot under a 99%-one-host frontier (SURVEY
§7.6 skew shape), capacity-doubling rebuilds, and mark_seen
equivalence with the plain anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from node_crawler_spark.operators.seenset import BloomSeenSet, mark_seen


def _urls(spark, n, prefix="http://www.site.test/p", start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url")
    )


def test_no_false_negatives(spark):
    b = BloomSeenSet(spark, shards=16, m_bits=1 << 14)
    seen = _urls(spark, 2000)
    b.insert(seen)
    probed = b.probe(seen, "url")
    assert probed.where(~F.col("_maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark):
    b = BloomSeenSet(spark, shards=16, m_bits=1 << 14)  # cap ~26k keys
    b.insert(_urls(spark, 2000))
    fresh = _urls(spark, 2000, prefix="http://other.test/q")
    fp = b.probe(fresh, "url").where(F.col("_maybe_seen")).count()
    assert fp / 2000 < 0.05, f"false-positive rate {fp / 2000:.3f}"


def test_hot_domain_skew_spreads_shards(spark):
    """99% of urls on one host must still spread ~uniformly over the
    shards (the domain-hash salt never funnels a hot domain into one
    bloom shard / seen bucket)."""
    hot = _urls(spark, 990, prefix="http://hot.test/p")
    cold = _urls(spark, 10, prefix="http://cold.test/p")
    b = BloomSeenSet(spark, shards=16, m_bits=1 << 14)
    b.insert(hot.unionByName(cold))
    counts = [r["count"] for r in b.table.groupBy("shard").count().collect()]
    assert len(counts) == 16, "every shard must receive keys"
    # per-shard *key* spread: re-derive the shard column the way insert does
    from node_crawler_spark.operators.seenset import _hash_cols

    per_shard = (
        _hash_cols(hot.unionByName(cold), "url", 16)
        .groupBy("_b_shard").count().collect()
    )
    vals = [r["count"] for r in per_shard]
    assert max(vals) < 3 * (sum(vals) / len(vals)), f"shard hotspot: {vals}"


def test_mark_seen_equivalent_with_and_without_bloom(spark):
    seen = _urls(spark, 500)
    b = BloomSeenSet(spark, shards=8, m_bits=1 << 13)
    b.insert(seen)
    cands = (
        _urls(spark, 300, start=400)  # 100 overlap, 200 fresh
        .select(F.col("url").alias("ins_url"))
    )
    seen_keys = seen.select(F.col("url").alias("ins_url"))
    plain = mark_seen(cands, seen_keys, None)
    bloomed = mark_seen(cands, seen_keys, b)
    a = sorted((r.ins_url, r._seen) for r in plain.collect())
    c = sorted((r.ins_url, r._seen) for r in bloomed.collect())
    assert a == c


def test_rebuild_doubles_capacity_keeps_membership(spark):
    b = BloomSeenSet(spark, shards=4, bits_per_key=10, m_bits=1 << 10)
    # capacity = 4*1024/10 ≈ 409 keys; insert 2000 → overloaded
    seen = _urls(spark, 2000)
    b.insert(seen)
    m0 = b.m
    assert b.rebuild_if_overloaded(seen)
    assert b.m > m0
    assert b.probe(seen, "url").where(~F.col("_maybe_seen")).count() == 0
    fresh = _urls(spark, 1000, prefix="http://x.test/")
    fp = b.probe(fresh, "url").where(F.col("_maybe_seen")).count()
    assert fp / 1000 < 0.05


def test_crawl_identical_with_bloom_disabled(spark, tmp_path):
    """Goldens run with the bloom ON by default; this pins that the
    bloom changes nothing: same crawl with use_bloom_prefilter=False."""
    from node_crawler_spark.config import CrawlConfig
    from node_crawler_spark.plans.driver import run_crawl
    from node_crawler_spark.sources.fixtures import scenario

    s = scenario("chain4")
    pages, http = s.dfs(spark)
    cfg_on = CrawlConfig(**{**s.cfg.__dict__, "bloom_engage_ratio": 0.0})
    on = run_crawl(spark, cfg_on, pages, http, s.seeds, str(tmp_path / "on"))
    cfg_off = CrawlConfig(**{**s.cfg.__dict__, "use_bloom_prefilter": False})
    off = run_crawl(spark, cfg_off, pages, http, s.seeds, str(tmp_path / "off"))
    a = sorted((r.seq, r.url) for r in on.seen(spark).collect())
    c = sorted((r.seq, r.url) for r in off.seen(spark).collect())
    assert a == c
