"""Sitemap-driven seed discovery (operators/sitemaps.py): kernel
parses, store-level discovery with <sitemapindex> nesting, the
queue-gate e2e, and the CLI flag."""

from __future__ import annotations

import gzip

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.operators.sitemaps import (
    parse_robots_sitemaps_py,
    parse_sitemap_py,
    seed_tuples,
    seeds_from_sitemaps,
)
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import BASE, Scenario


def test_parse_sitemap_urlset_and_entities():
    body = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://x.test/a?p=1&amp;q=2</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>
    http://x.test/b
  </loc></url>
</urlset>"""
    kind, locs = parse_sitemap_py(body)
    assert kind == "urlset"
    assert locs == ["http://x.test/a?p=1&q=2", "http://x.test/b"]


def test_parse_sitemap_index_and_nonsitemap():
    idx = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://x.test/s1.xml</loc></sitemap>
  <sitemap><loc>http://x.test/s2.xml.gz</loc></sitemap>
</sitemapindex>"""
    kind, locs = parse_sitemap_py(idx)
    assert kind == "index"
    assert locs == ["http://x.test/s1.xml", "http://x.test/s2.xml.gz"]
    assert parse_sitemap_py("<html><body>not a sitemap</body></html>") == ("", [])
    assert parse_sitemap_py("") == ("", [])
    # double-encoded entity must single-decode: &amp;lt; → &lt;, not <
    one = "<urlset><url><loc>http://x.test/?a=&amp;lt;b</loc></url></urlset>"
    assert parse_sitemap_py(one)[1] == ["http://x.test/?a=&lt;b"]


def test_parse_robots_sitemap_declarations():
    body = """User-agent: *
Disallow: /private
Sitemap: http://x.test/deep/map.xml  # trailing comment
sitemap: http://x.test/other.xml

User-agent: bot
Sitemap: http://x.test/third.xml
"""
    assert parse_robots_sitemaps_py(body) == [
        "http://x.test/deep/map.xml",
        "http://x.test/other.xml",
        "http://x.test/third.xml",  # global directive — group-independent
    ]
    assert parse_robots_sitemaps_py("User-agent: *\nDisallow: /\n") == []


def _sitemap_scenario() -> Scenario:
    """Store layout: robots.txt declares a nonstandard sitemap;
    /sitemap.xml is an INDEX nesting two urlsets (one gzipped)."""
    s = Scenario(name="sitemap_seeds", cfg=CrawlConfig(), seeds=[])
    s.page(f"{BASE}/a", "<html><body>A</body></html>")
    s.page(f"{BASE}/b", "<html><body>B</body></html>")
    s.page(f"{BASE}/c", "<html><body>C</body></html>")
    s.pages.append(
        (f"{BASE}/robots.txt", None,
         f"User-agent: *\nSitemap: {BASE}/maps/extra.xml\n".encode(), None, "en")
    )
    s.pages.append(
        (f"{BASE}/maps/extra.xml", None,
         f"<urlset><url><loc>{BASE}/c</loc></url></urlset>".encode(),
         None, "en")
    )
    index = (
        f"<sitemapindex><sitemap><loc>{BASE}/maps/s1.xml</loc></sitemap>"
        f"<sitemap><loc>{BASE}/maps/s2.xml.gz</loc></sitemap></sitemapindex>"
    )
    s.pages.append((f"{BASE}/sitemap.xml", None, index.encode(), None, "en"))
    s.pages.append(
        (f"{BASE}/maps/s1.xml", None,
         f"<urlset><url><loc>{BASE}/a</loc></url></urlset>".encode(),
         None, "en")
    )
    s.pages.append(
        (f"{BASE}/maps/s2.xml.gz", None,
         gzip.compress(
             f"<urlset><url><loc>{BASE}/b</loc></url></urlset>".encode()
         ),
         None, "en")
    )
    return s


def test_seeds_from_sitemaps_discovery(spark):
    s = _sitemap_scenario()
    pages, _http = s.dfs(spark)
    seeds = seed_tuples(seeds_from_sitemaps(pages))
    assert seeds == (f"{BASE}/a", f"{BASE}/b", f"{BASE}/c")


def test_seeds_from_sitemaps_index_depth_bound(spark):
    s = _sitemap_scenario()
    pages, _http = s.dfs(spark)
    # depth 1 parses only the first level: the robots-declared urlset
    # yields /c; the index's children are never fetched
    seeds = seed_tuples(seeds_from_sitemaps(pages, index_depth=1))
    assert seeds == (f"{BASE}/c",)


def test_sitemap_seeded_crawl_passes_queue_gates(spark, tmp_path):
    """Sitemap entries enter through the NORMAL gate chain: an
    exclude pattern drops /b exactly as it would a user seed, and the
    crawl equals one seeded by the equivalent hand-written list."""
    import dataclasses

    s = _sitemap_scenario()
    pages, http = s.dfs(spark)
    cfg = dataclasses.replace(s.cfg, exclude_patterns=("/b$",))

    seeds = [u for u in seed_tuples(seeds_from_sitemaps(pages))]
    res = run_crawl(spark, cfg, pages, http, seeds, str(tmp_path / "r"))
    seen = {r.url for r in res.seen(spark).collect()}
    assert seen == {f"{BASE}/a", f"{BASE}/c"}

    manual = run_crawl(
        spark, cfg, pages, http,
        [f"{BASE}/a", f"{BASE}/b", f"{BASE}/c"], str(tmp_path / "m"),
    )
    assert seen == {r.url for r in manual.seen(spark).collect()}


def test_cli_seeds_from_sitemaps(spark, tmp_path, capsys):
    import json

    from node_crawler_spark.cli import main

    s = _sitemap_scenario()
    pages, http = s.dfs(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    http.write.parquet(str(tmp_path / "http"))

    rc = main([
        "--seeds-from-sitemaps",
        "--pages", str(tmp_path / "pages"),
        "--http-meta", str(tmp_path / "http"),
        "--store", str(tmp_path / "store"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert summary["urls_seen"] == 3
