"""robots.txt parsing from the page store + the Crawler facade (the
reference's public event API, 1:1)."""

from __future__ import annotations

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.crawler import Crawler
from node_crawler_spark.operators.robots import (
    delay_tuples,
    merge_robots_delays,
    parse_robots_body,
    parse_robots_delay_ms,
    robots_delays_from_pages,
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


def test_parse_robots_delay_precedence_and_units():
    body = """
User-agent: *
Crawl-delay: 2
Disallow: /x

User-agent: nc-spark
Crawl-delay: 0.5

User-agent: brokenbot
Crawl-delay: soon
"""
    assert parse_robots_delay_ms(body, "*") == 2000
    # exact-agent group beats the * group; fractional seconds → ms
    assert parse_robots_delay_ms(body, "NC-Spark") == 500
    # malformed value skipped → falls back to the * group's delay
    assert parse_robots_delay_ms(body, "brokenbot") == 2000
    assert parse_robots_delay_ms("User-agent: *\nDisallow: /a\n", "*") is None
    # first value wins within a precedence level; negatives skipped
    multi = "User-agent: *\nCrawl-delay: -1\nCrawl-delay: 3\nCrawl-delay: 9\n"
    assert parse_robots_delay_ms(multi, "*") == 3000


def test_merge_robots_delays_explicit_rules_win():
    from node_crawler_spark.config import PolitenessRule

    cfg = CrawlConfig(
        politeness=(PolitenessRule("a.test", budget=5, crawl_delay_ms=100),)
    )
    merged = merge_robots_delays(cfg, [("a.test", 9000), ("b.test", 2000)])
    rules = {p.domain: p for p in merged.politeness}
    assert rules["a.test"].crawl_delay_ms == 100  # explicit rule kept
    assert rules["b.test"].crawl_delay_ms == 2000
    assert rules["b.test"].budget == 0  # delay-only (unlimited budget)


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
    assert rules == (("www.site.test", "/private", False),)

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


def test_robots_crawl_delay_from_store_e2e(spark, tmp_path):
    """Crawl-delay declared in a stored robots.txt throttles the crawl
    exactly like the equivalent hand-written politeness rule."""
    import dataclasses

    from node_crawler_spark.config import PolitenessRule

    s = scenario("chain4")
    s.pages.append(
        (f"{BASE}/robots.txt", None,
         b"User-agent: *\nCrawl-delay: 3\n", None, "en")
    )
    pages, http = s.dfs(spark)

    derived = delay_tuples(robots_delays_from_pages(pages))
    assert derived == (("www.site.test", 3000),)

    cfg = merge_robots_delays(
        dataclasses.replace(s.cfg, max_rounds=40), derived
    )
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / "r"))

    manual = run_crawl(
        spark,
        dataclasses.replace(
            s.cfg,
            max_rounds=40,
            politeness=(
                PolitenessRule("www.site.test", budget=0, crawl_delay_ms=3000),
            ),
        ),
        pages, http, s.seeds, str(tmp_path / "m"),
    )
    r_sched = sorted((r.round, r.url) for r in res.crawled(spark).collect())
    m_sched = sorted((r.round, r.url) for r in manual.crawled(spark).collect())
    assert r_sched == m_sched
    fetch_rounds = sorted(r for r, _ in r_sched)
    assert all(r % 3 == 0 for r in fetch_rounds), fetch_rounds


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


def test_parse_robots_rules_rfc_group_selection():
    from node_crawler_spark.operators.robots import parse_robots_rules

    body = """
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: nc-spark
Disallow: /named

User-agent: nc-spark
Allow: /named/ok$
"""
    # '*' agent: only the star group
    assert parse_robots_rules(body, "*") == [
        ("/private", False), ("/private/ok", True)
    ]
    # exact-agent groups MERGE and beat the '*' group (RFC 9309 2.2.1)
    assert parse_robots_rules(body, "NC-Spark") == [
        ("/named", False), ("/named/ok$", True)
    ]
    assert parse_robots_rules("User-agent: *\nDisallow:", "*") == []


def test_robots_allowed_rfc_match_semantics():
    from node_crawler_spark.operators.robots import robots_allowed

    rules = [("/private", False), ("/private/ok", True)]
    assert not robots_allowed(rules, "/private/a")
    assert robots_allowed(rules, "/private/ok/x")  # longest match wins
    assert robots_allowed(rules, "/public")        # no match = allowed
    assert robots_allowed([], "/anything")
    # '*' wildcard spans any run; trailing '$' anchors
    assert not robots_allowed([("/*.pdf$", False)], "/docs/a.pdf")
    assert robots_allowed([("/*.pdf$", False)], "/docs/a.pdf?x=1")
    assert not robots_allowed([("/a/*/c", False)], "/a/b/c")
    # equal-length allow and disallow: allow wins (RFC 9309 2.2.2)
    assert robots_allowed([("/dir/page", False), ("/dir/page", True)], "/dir/page")
    # query string participates in the match
    assert not robots_allowed([("/*?sessionid=", False)], "/x?sessionid=7")


def test_robots_rfc_gate_e2e_vs_simulator(spark, tmp_path):
    """Allow overrides inside a disallowed subtree + a $-anchored
    wildcard, enforced identically by the Spark gate and the
    sequential simulator."""
    from tests.reference_sim import simulate

    rules = (
        ("www.site.test", "/private", False),
        ("www.site.test", "/private/ok", True),
        ("www.site.test", "/*.pdf$", False),
    )
    s = Scenario(
        name="rfc_robots", cfg=CrawlConfig(robots=rules), seeds=[f"{BASE}/"]
    )
    body = (
        '<a href="/private/a">x</a><a href="/private/ok/page">y</a>'
        '<a href="/doc.pdf">z</a><a href="/doc.pdf?dl=1">w</a>'
        '<a href="/public">p</a>'
    )
    s.page(f"{BASE}/", f"<html><body>{body}</body></html>")
    for p in ["/private/a", "/private/ok/page", "/doc.pdf",
              "/doc.pdf?dl=1", "/public"]:
        s.page(f"{BASE}{p}", "<html></html>")

    pages, http = s.dfs(spark)
    res = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "r"))
    seen = [r.url for r in sorted(res.seen(spark).collect(), key=lambda r: r.seq)]

    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    assert seen == sim.seen
    assert f"{BASE}/private/ok/page" in seen      # Allow override
    assert f"{BASE}/private/a" not in seen        # Disallow prefix
    assert f"{BASE}/doc.pdf" not in seen          # wildcard + $
    assert f"{BASE}/doc.pdf?dl=1" in seen         # $ anchor respects query
    assert f"{BASE}/public" in seen
