"""Interaction golden: cfg.sequential_cookies × mid-crawl ``queue()``
(VERDICT r4 #7 — the two round-4 features had never been exercised
together). A url queue()d from a callback joins the SAME round's
insert stream; with sequential_cookies the cookie fixpoint must treat
it exactly like the sequential reference treats a late queue push —
cookies committed by any earlier-seq page of the round are visible to
it, later-seq cookies are not."""

from __future__ import annotations

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.crawler import Crawler
from node_crawler_spark.sources.fixtures import BASE, Scenario, _links
from tests.reference_sim import simulate


def _scenario(cfg, seeds) -> Scenario:
    s = Scenario(name="seq_cookie_queue", cfg=cfg, seeds=seeds)
    s.page(f"{BASE}/first", _links())
    s.page(f"{BASE}/make-cookie", _links(), set_cookie="sid=abc")
    s.page(f"{BASE}/account", _links("/deeper"), requires_cookie=True)
    s.page(f"{BASE}/deeper", _links())
    return s


def _drive(spark, tmp_path, s, queue_from, tag):
    pages, http = s.dfs(spark)
    c = Crawler(spark, pages, http, str(tmp_path / tag),
                sequential_cookies=s.cfg.sequential_cookies)
    c.on("pageCrawl",
         lambda row: c.queue(f"{BASE}/account")
         if row.url == queue_from else None)
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()
    crawled = {r.url: r.seq for r in res.crawled(spark).collect()}
    errors = {r.url: r.status_code for r in res.errors(spark).collect()}

    def sim_cb(row, q):
        if row["url"] == queue_from:
            q(f"{BASE}/account")

    sim = simulate(s.cfg, s.seeds, s.pages, s.http, on_page_crawl=sim_cb)
    return crawled, errors, sim


def test_queued_requirer_sees_setters_cookie_same_round(spark, tmp_path):
    """/make-cookie (seq 1) stores the cookie; its callback queues
    /account into the same round — sequential mode makes the cookie
    visible, /account answers 200 and its link is followed."""
    cfg = CrawlConfig(sequential_cookies=True)
    s = _scenario(cfg, [f"{BASE}/make-cookie"])
    crawled, errors, sim = _drive(spark, tmp_path, s,
                                  f"{BASE}/make-cookie", "fwd")
    assert errors == {}
    assert f"{BASE}/account" in crawled and f"{BASE}/deeper" in crawled
    assert {c["url"]: c["seq"] for c in sim.crawled} == crawled
    assert [e["url"] for e in sim.errors] == []


def test_queued_requirer_after_later_seq_setter(spark, tmp_path):
    """/first (seq 1, no cookie) queues /account from its callback;
    the reference appends it AFTER the already-queued /make-cookie
    seed (seq 2), so the queued page lands at seq 3 and the
    sequential fixpoint makes seq 2's cookie visible to it — the
    mid-crawl insertion point and the cookie pass must agree on the
    same ordering."""
    cfg = CrawlConfig(sequential_cookies=True)
    s = _scenario(cfg, [f"{BASE}/first", f"{BASE}/make-cookie"])
    crawled, errors, sim = _drive(spark, tmp_path, s,
                                  f"{BASE}/first", "after")
    sim_crawled = {c["url"]: c["seq"] for c in sim.crawled}
    assert sim_crawled == crawled
    assert {e["url"]: e["status_code"] for e in sim.errors} == errors
    assert f"{BASE}/account" in crawled          # cookie was visible
    assert f"{BASE}/deeper" in crawled
