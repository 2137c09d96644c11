"""CrawlResult.report — the per-domain operations rollup, checked
against the sequential simulator's event lists."""

from __future__ import annotations

from collections import Counter

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.functions.urlkit import node_parse
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import BASE, Scenario
from tests.reference_sim import simulate


def _mixed_scenario() -> Scenario:
    """Crawled pages + a 404 + a redirect chain + an external link
    (crawled with crawl_external) across two domains."""
    s = Scenario(
        name="report_mix",
        cfg=CrawlConfig(crawl_external=True),
        seeds=[f"{BASE}/"],
    )
    body = (
        '<a href="/ok">a</a><a href="/missing">b</a>'
        '<a href="/hop">c</a><a href="http://other.test/x">d</a>'
    )
    s.page(f"{BASE}/", f"<html><body>{body}</body></html>")
    s.page(f"{BASE}/ok", "<html></html>")
    s.page(f"{BASE}/missing", "", status=404, store_body=False)
    s.page(
        f"{BASE}/hop", status=301, location="/landed",
        content_type=None, store_body=False,
    )
    s.page(f"{BASE}/landed", "<html></html>")
    s.page("http://other.test/x", "<html></html>")
    return s


def _dom(url: str) -> str:
    return node_parse(url)["host"]


def test_report_matches_simulator(spark, tmp_path):
    s = _mixed_scenario()
    pages, http = s.dfs(spark)
    res = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / "r"))
    rep = {r.domain: r for r in res.report(spark).collect()}

    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    exp_seen = Counter(_dom(u) for u in sim.seen)
    exp_crawled = Counter(_dom(c["url"]) for c in sim.crawled)
    exp_errors = Counter(_dom(e["url"]) for e in sim.errors)
    exp_redirects = Counter(_dom(e["pre_url"]) for e in sim.redirect_events)

    assert set(rep) == set(exp_seen)
    for d, row in rep.items():
        assert row.n_seen == exp_seen[d], d
        assert row.n_crawled == exp_crawled[d], d
        assert row.n_error == exp_errors[d], d
        assert row.n_redirect == exp_redirects[d], d

    # the mix actually exercised every column
    site = rep[_dom(f"{BASE}/")]
    assert site.n_error == 1 and site.n_redirect >= 1
    assert rep["other.test"].n_crawled == 1
    assert site.last_fetch_round is not None


def test_cli_report_export(spark, tmp_path, capsys):
    import json

    from node_crawler_spark.cli import main

    s = _mixed_scenario()
    pages, http = s.dfs(spark)
    pages.write.parquet(str(tmp_path / "pages"))
    http.write.parquet(str(tmp_path / "http"))
    rc = main(
        [
            "--seeds", *s.seeds,
            "--pages", str(tmp_path / "pages"),
            "--http-meta", str(tmp_path / "http"),
            "--store", str(tmp_path / "store"),
            "--crawl-external",
            "--report", str(tmp_path / "rep"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["report"]["domains"] == 2
    rep = {r.domain: r for r in spark.read.parquet(str(tmp_path / "rep")).collect()}
    assert rep["www.site.test"].n_error == 1
