"""robots.txt parsing from the page store + the Crawler facade (the
reference's public event API, 1:1)."""

from __future__ import annotations

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.crawler import Crawler
from node_crawler_spark.operators.robots import (
    parse_robots_body,
    robots_rules_from_pages,
    rules_tuples,
)
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import BASE, Scenario, scenario


def test_parse_robots_body_groups_and_agents():
    body = """
# comment
User-agent: *
Disallow: /private
Disallow: /tmp/

User-agent: evilbot
Disallow: /

User-agent: nc-spark
User-agent: otherbot
Disallow: /only-for-named
Allow: /only-for-named/ok
"""
    assert parse_robots_body(body, "*") == ["/private", "/tmp/"]
    assert parse_robots_body(body, "evilbot") == ["/private", "/tmp/", "/"]
    assert parse_robots_body(body, "NC-Spark") == [
        "/private", "/tmp/", "/only-for-named"
    ]
    assert parse_robots_body("User-agent: *\nDisallow:", "*") == []


def _robots_scenario() -> Scenario:
    s = Scenario(name="robots_from_store", cfg=CrawlConfig(), seeds=[f"{BASE}/"])
    links = '<a href="/private/a">x</a><a href="/public/b">x</a>'
    s.page(f"{BASE}/", f"<html><body>{links}</body></html>")
    s.page(f"{BASE}/private/a", "")
    s.page(f"{BASE}/public/b", "")
    # robots.txt lives in the page store like any other snapshot
    s.pages.append(
        (f"{BASE}/robots.txt", None,
         b"User-agent: *\nDisallow: /private\n", None, "en")
    )
    return s


def test_robots_rules_from_pages_and_gate(spark, tmp_path):
    s = _robots_scenario()
    pages, http = s.dfs(spark)

    rules = rules_tuples(robots_rules_from_pages(pages))
    assert rules == (("www.site.test", "/private"),)

    cfg = CrawlConfig(**{**s.cfg.__dict__, "robots": rules})
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "r"))
    seen = {r.url for r in res.seen(spark).collect()}
    assert f"{BASE}/public/b" in seen
    assert f"{BASE}/private/a" not in seen
    # identical to hand-written config rules (the existing golden gate)
    manual = run_crawl(
        spark,
        CrawlConfig(robots=(("www.site.test", "/private"),)),
        pages, http, s.seeds, str(tmp_path / "m"),
    )
    assert seen == {r.url for r in manual.seen(spark).collect()}


def test_crawler_facade_events_in_seq_order(spark, tmp_path):
    s = scenario("redirect_to_seen")
    pages, http = s.dfs(spark)

    crawled_urls, error_rows, redirect_rows, drained = [], [], [], []
    c = Crawler(spark, pages, http, str(tmp_path / "c"))
    c.on("pageCrawl", lambda row: crawled_urls.append((row.seq, row.url)))
    c.on("error", lambda row: error_rows.append(row.seq))
    c.on("redirect", lambda row: redirect_rows.append(row.clean_final))
    c.on("drain", lambda: drained.append(True))
    for seed in s.seeds:
        c.queue(seed)
    result = c.start()

    from tests.reference_sim import simulate

    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    assert crawled_urls == sorted(crawled_urls)
    assert [u for _, u in crawled_urls] == [
        c_["url"] for c_ in sorted(sim.crawled, key=lambda x: x["seq"])
    ]
    assert redirect_rows == [e["clean_final"] for e in sim.redirect_events]
    assert drained == [True]
    assert result.max_seq == len(sim.seen)


def test_crawler_facade_camelcase_options(spark, tmp_path):
    s = scenario("exclude_patterns")
    pages, http = s.dfs(spark)
    c = Crawler(
        spark, pages, http, str(tmp_path / "x"),
        crawlExternal=False,
        excludePatterns=["/private", "skip.*me"],
        retries=0,
    )
    assert c.cfg.exclude_patterns == ("/private", "skip.*me")
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()
    seen = {r.url for r in res.seen(spark).collect()}
    assert all("/private" not in u and "SKIP" not in u for u in seen)
