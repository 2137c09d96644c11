"""CuckooSeenSet — the cuckoo half of the north_star's "bloom/cuckoo"
seen-set sidecar. Same safety contract as the bloom (NO false
negatives for inserted keys, bounded false positives, probe falls
back safely on saturation) plus the cuckoo-only capability: remove().
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from node_crawler_spark.operators.seenset import CuckooSeenSet, mark_seen


def _urls(spark, n, prefix="http://www.site.test/p", start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url")
    )


def test_no_false_negatives(spark):
    c = CuckooSeenSet(spark, shards=16, buckets=1 << 8)  # cap ~14k
    seen = _urls(spark, 2000)
    c.insert(seen)
    assert c.probe(seen, "url").where(~F.col("_maybe_seen")).count() == 0


def test_false_positive_rate_bounded(spark):
    c = CuckooSeenSet(spark, shards=16, buckets=1 << 8)
    c.insert(_urls(spark, 2000))
    fresh = _urls(spark, 2000, prefix="http://other.test/q")
    fp = c.probe(fresh, "url").where(F.col("_maybe_seen")).count()
    # 16-bit fingerprints, 8 slots probed: FP ≈ 8/65535 ≈ 1.2e-4
    assert fp / 2000 < 0.01, f"false-positive rate {fp / 2000:.4f}"


def test_remove_deletes_membership(spark):
    c = CuckooSeenSet(spark, shards=8, buckets=1 << 8)
    keep = _urls(spark, 500)
    drop = _urls(spark, 500, start=10_000)
    c.insert(keep)
    c.insert(drop)
    c.remove(drop)
    # removed keys gone (modulo the ~1e-4 fp floor), kept keys intact
    still = c.probe(drop, "url").where(F.col("_maybe_seen")).count()
    assert still <= 2, f"{still} removed keys still probe positive"
    assert c.probe(keep, "url").where(~F.col("_maybe_seen")).count() == 0


def test_insert_idempotent(spark):
    c = CuckooSeenSet(spark, shards=8, buckets=1 << 6)
    u = _urls(spark, 200)
    for _ in range(3):  # re-inserting must not consume slots
        c.insert(u, n_keys=0)
    c.n_keys = 200
    assert c.probe(u, "url").where(~F.col("_maybe_seen")).count() == 0
    assert not c._any_saturated()


def test_saturation_probes_safe_then_rebuild(spark):
    # 4 shards × 8 buckets × 4 slots = 128 slots; 2000 keys overflow
    c = CuckooSeenSet(spark, shards=4, buckets=1 << 3, kick_limit=50)
    seen = _urls(spark, 2000)
    c.insert(seen)
    assert c._any_saturated()
    # safety first: NO false negatives even while saturated
    assert c.probe(seen, "url").where(~F.col("_maybe_seen")).count() == 0
    assert c.rebuild_if_overloaded(seen)
    assert not c._any_saturated()
    assert c.probe(seen, "url").where(~F.col("_maybe_seen")).count() == 0


def test_mark_seen_equivalent_with_and_without_cuckoo(spark):
    seen = _urls(spark, 1000)
    cand = _urls(spark, 1500, start=500).select(
        F.col("url").alias("ins_url")
    )
    c = CuckooSeenSet(spark, shards=16, buckets=1 << 8)
    c.insert(seen)
    with_f = mark_seen(cand, seen.select(F.col("url").alias("ins_url")), c)
    without = mark_seen(cand, seen.select(F.col("url").alias("ins_url")), None)
    a = {(r.ins_url, r._seen) for r in with_f.collect()}
    b = {(r.ins_url, r._seen) for r in without.collect()}
    assert a == b


def test_crawl_identical_with_cuckoo_filter(spark, tmp_path):
    """seen_filter='cuckoo' (probe forced on every round) reproduces
    the plain crawl exactly — the D1 contract for the cuckoo half."""
    from node_crawler_spark.config import CrawlConfig
    from node_crawler_spark.plans.driver import run_crawl
    from node_crawler_spark.sources.fixtures import scenario

    s = scenario("chain4")
    pages, http = s.dfs(spark)
    cfg_c = CrawlConfig(
        **{**s.cfg.__dict__, "seen_filter": "cuckoo", "bloom_engage_ratio": 0.0}
    )
    cu = run_crawl(spark, cfg_c, pages, http, s.seeds, str(tmp_path / "cu"))
    cfg_off = CrawlConfig(**{**s.cfg.__dict__, "use_bloom_prefilter": False})
    off = run_crawl(spark, cfg_off, pages, http, s.seeds, str(tmp_path / "off"))
    a = sorted((r.seq, r.url) for r in cu.seen(spark).collect())
    c = sorted((r.seq, r.url) for r in off.seen(spark).collect())
    assert a == c
