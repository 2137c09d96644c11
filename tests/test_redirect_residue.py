"""Bounded contested-redirect residue (VERDICT r1 item 6): above
``redirect_residue_cap`` the sequential drop-resolution walk runs in a
single executor task instead of a driver collect. Forcing cap=0 must
reproduce every redirect golden bit-identically — including an
adversarial all-redirect round."""

from __future__ import annotations

import pytest

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import BASE, Scenario, scenario
from tests.reference_sim import simulate

REDIRECT_SCENARIOS = [
    "redirect_chain", "redirect_multi_hop", "redirect_to_seen",
    "redirect_infinite", "redirect_dead_hop",
]


@pytest.mark.parametrize("name", REDIRECT_SCENARIOS)
def test_executor_walk_matches_sim(spark, tmp_path, name):
    s = scenario(name)
    cfg = CrawlConfig(**{**s.cfg.__dict__, "redirect_residue_cap": 0})
    pages, http = s.dfs(spark)
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / name))
    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    assert [r.url for r in seen_rows] == sim.seen
    got_crawled = sorted(r.seq for r in res.crawled(spark).collect())
    assert got_crawled == sorted(c["seq"] for c in sim.crawled)


def test_adversarial_all_redirect_round(spark, tmp_path):
    """Every page in the round redirects; several chains contend for the
    same landings (the drop/un-collide interleaving). Driver path and
    executor path must agree with the sequential simulator."""
    s = Scenario(name="all_redirect", cfg=CrawlConfig(), seeds=[f"{BASE}/"])
    links = [f"/r{i}" for i in range(12)]
    s.page(f"{BASE}/", "".join(f'<a href="{h}">x</a>' for h in links))
    for i in range(12):
        # pairs of chains land on the same target: the first wins, the
        # second's landing collides ⇒ its page drops
        s.page(f"{BASE}/r{i}", status=301, location=f"/land{i // 2}",
               content_type=None, store_body=False)
    for i in range(6):
        s.page(f"{BASE}/land{i}", "")

    pages, http = s.dfs(spark)
    sim = simulate(s.cfg, s.seeds, s.pages, s.http)

    for cap, tag in ((10**9, "driver"), (0, "executor")):
        cfg = CrawlConfig(**{**s.cfg.__dict__, "redirect_residue_cap": cap})
        res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / tag))
        seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
        assert [r.url for r in seen_rows] == sim.seen, tag
        got = sorted(r.seq for r in res.crawled(spark).collect())
        assert got == sorted(c["seq"] for c in sim.crawled), tag
