"""workers=K>1 (VERDICT r1 item 9): the reference defaults to 4
concurrent workers (crawler.js:23). Dispatch is FIFO; completion order
is whatever the network gives. These tests pin the engine's guarantee
at K>1: the SCHEDULE SET (seen set, crawled set) is invariant under
completion order, and with deterministic completions the K-worker
crawl is byte-identical to the sequential one — which is exactly what
the batch-per-round engine computes."""

from __future__ import annotations

import pytest

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import scenario
from tests.reference_sim import simulate

SCENARIOS = ["basic_link_crawl", "chain4", "dup_links_one_page",
             "kitchen_sink"]


@pytest.mark.parametrize("name", SCENARIOS)
def test_k_workers_fifo_completions_equal_sequential(name):
    """Lemma: with completions processed in dispatch order, K workers
    produce the exact sequential schedule (the queue is FIFO, so a
    batch's inserts land after every already-queued page either way)."""
    s = scenario(name)
    one = simulate(s.cfg, s.seeds, s.pages, s.http, workers=1)
    four = simulate(s.cfg, s.seeds, s.pages, s.http, workers=4)
    assert four.seen == one.seen
    assert [c["seq"] for c in four.crawled] == [c["seq"] for c in one.crawled]


@pytest.mark.parametrize("name", SCENARIOS)
def test_engine_matches_adversarial_completion_sets(spark, tmp_path, name):
    """Under an adversarial (reversed) completion order the seen/crawled
    SETS are unchanged, and the engine (workers-agnostic batch rounds)
    reproduces them with cfg.workers=4."""
    s = scenario(name)
    adv = simulate(
        s.cfg, s.seeds, s.pages, s.http, workers=4,
        completion_order=lambda batch: list(reversed(batch)),
    )
    one = simulate(s.cfg, s.seeds, s.pages, s.http, workers=1)
    assert set(adv.seen) == set(one.seen)
    assert {c["url"] for c in adv.crawled} == {c["url"] for c in one.crawled}

    cfg = CrawlConfig(**{**s.cfg.__dict__, "workers": 4})
    pages, http = s.dfs(spark)
    res = run_crawl(spark, cfg, pages, http, s.seeds, str(tmp_path / name))
    assert {r.url for r in res.seen(spark).collect()} == set(adv.seen)
    assert {r.url for r in res.crawled(spark).collect()} == {
        c["url"] for c in adv.crawled
    }
    # and the engine's insertion ORDER still matches the FIFO oracle
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    assert [r.url for r in seen_rows] == one.seen
