"""Same-round cookie visibility (the last reference deviation worth
code, VERDICT r3 #7): with cfg.sequential_cookies the engine
reproduces the workers=1 sequential reference exactly — a cookie
stored by page X's chain is visible to every later-seq page of the
SAME round (cookieSpec.js model; crawler.js:31-36 keeps one jar for
the whole crawl, so under one worker a page sees everything stored
before it). Default config keeps the deterministic round barrier."""

from __future__ import annotations

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import BASE, Scenario, _links
from tests.reference_sim import simulate


def _two_seed_scenario(cfg, seeds) -> Scenario:
    s = Scenario(name="seq_cookies", cfg=cfg, seeds=seeds)
    s.page(f"{BASE}/make-cookie", _links(), set_cookie="sid=abc")
    s.page(f"{BASE}/account", _links("/deeper"), requires_cookie=True)
    s.page(f"{BASE}/deeper", _links())
    return s


def _run(spark, tmp_path, s, tag):
    pages, http = s.dfs(spark)
    res = run_crawl(spark, s.cfg, pages, http, s.seeds,
                    str(tmp_path / tag))
    crawled = {r.url: r.seq for r in res.crawled(spark).collect()}
    errors = {r.url: r.status_code for r in res.errors(spark).collect()}
    return res, crawled, errors


def test_same_round_cookie_visible_in_sequential_mode(spark, tmp_path):
    cfg = CrawlConfig(sequential_cookies=True)
    seeds = [f"{BASE}/make-cookie", f"{BASE}/account"]
    s = _two_seed_scenario(cfg, seeds)
    res, crawled, errors = _run(spark, tmp_path, s, "seq")

    sim = simulate(cfg, seeds, s.pages, s.http)
    # the reference: /make-cookie (seq 1) stores the cookie, /account
    # (seq 2, same round) replays it → 200, and its link is followed
    assert f"{BASE}/account" in crawled and errors == {}
    assert f"{BASE}/deeper" in crawled
    assert sorted(crawled) == sorted(c["url"] for c in sim.crawled)
    assert {c["url"]: c["seq"] for c in sim.crawled} == crawled


def test_setter_after_requirer_still_403s(spark, tmp_path):
    # strict <: a cookie stored by a LATER-seq page of the round must
    # not leak backwards (the sequential reference processed the
    # requirer first)
    cfg = CrawlConfig(sequential_cookies=True)
    seeds = [f"{BASE}/account", f"{BASE}/make-cookie"]
    s = _two_seed_scenario(cfg, seeds)
    res, crawled, errors = _run(spark, tmp_path, s, "rev")

    sim = simulate(cfg, seeds, s.pages, s.http)
    assert errors == {f"{BASE}/account": 403}
    assert [e["url"] for e in sim.errors] == [f"{BASE}/account"]
    assert f"{BASE}/deeper" not in crawled


def test_default_round_barrier_unchanged(spark, tmp_path):
    # without the flag the deterministic barrier holds: same-round
    # visibility stays out (matches the sim's depth-barrier default)
    cfg = CrawlConfig()
    seeds = [f"{BASE}/make-cookie", f"{BASE}/account"]
    s = _two_seed_scenario(cfg, seeds)
    res, crawled, errors = _run(spark, tmp_path, s, "bar")

    sim = simulate(cfg, seeds, s.pages, s.http)
    assert errors == {f"{BASE}/account": 403}
    assert [e["url"] for e in sim.errors] == [f"{BASE}/account"]


def test_sequential_chain_across_three_pages(spark, tmp_path):
    # the fixpoint genuinely iterates: A sets cookie-1 → B (requires
    # it) only then succeeds and its chain stores cookie for its OWN
    # domain via a redirect hop → C (same round, requires B's domain
    # cookie) then succeeds on the next pass
    cfg = CrawlConfig(sequential_cookies=True)
    seeds = [f"{BASE}/mk", "http://b.test/gate", "http://b.test/locked"]
    s = Scenario(name="seq_chain", cfg=cfg, seeds=seeds)
    s.page(f"{BASE}/mk", _links(), set_cookie="sid=1")
    # cookies are per-domain: b.test's cookie comes from /gate's 30x
    # hop (stored chain-locally, committed with /gate's seq), and
    # /locked (later seq, same round) needs it via the global jar
    s.page("http://b.test/gate", status=302, location="/landing",
           content_type=None, store_body=False, set_cookie="tok=9")
    s.page("http://b.test/landing", _links())
    s.page("http://b.test/locked", _links(), requires_cookie=True)
    res, crawled, errors = _run(spark, tmp_path, s, "chain")

    sim = simulate(cfg, seeds, s.pages, s.http)
    assert errors == {}
    assert sorted(crawled) == sorted(c["url"] for c in sim.crawled)
    assert {c["url"]: c["seq"] for c in sim.crawled} == crawled


def test_sequential_cookies_resume_bit_identical(spark, tmp_path):
    """The (domain, setter_seq) jar schema survives the kill/resume
    boundary: stop after round 1 (before the multi-round cookie chain
    completes), resume, and the final state matches an uninterrupted
    sequential-mode run table-for-table."""
    from node_crawler_spark.sources.store import SnapshotStore
    from tests.test_politeness_resume import _tables

    cfg = CrawlConfig(sequential_cookies=True)
    seeds = [f"{BASE}/make-cookie", f"{BASE}/account"]
    s = _two_seed_scenario(cfg, seeds)
    pages, http = s.dfs(spark)

    full = run_crawl(spark, cfg, pages, http, seeds, str(tmp_path / "full"))
    want = _tables(spark, full)

    part_cfg = CrawlConfig(**{**cfg.__dict__, "max_rounds": 1})
    run_crawl(spark, part_cfg, pages, http, seeds, str(tmp_path / "part"))
    assert SnapshotStore(str(tmp_path / "part")).last_committed_round() == 1

    resumed = run_crawl(
        spark, cfg, pages, http, seeds, str(tmp_path / "part"), resume=True
    )
    assert _tables(spark, resumed) == want
    assert resumed.max_seq == full.max_seq


def test_resume_across_cookie_mode_flip(spark, tmp_path):
    """Resuming with sequential_cookies flipped must not crash on the
    stored jar schema (code-review finding): the committed table is
    reconciled to the config's mode — a pre-flip cookie is visible to
    every remaining page either way (setter_seq 0 going to sequential;
    domain-distinct going to non-sequential)."""
    from node_crawler_spark.sources.store import SnapshotStore

    seeds = [f"{BASE}/make-cookie"]
    for first, then in ((False, True), (True, False)):
        tag = f"flip_{int(first)}"
        cfg1 = CrawlConfig(sequential_cookies=first, max_rounds=1)
        # round 1 sets the cookie; /account (requires_cookie) is only
        # REACHED in round 2, after the mode flip
        s = Scenario(name="seq_cookie_flip", cfg=cfg1, seeds=seeds)
        s.page(f"{BASE}/make-cookie", _links("/account"),
               set_cookie="sid=abc")
        s.page(f"{BASE}/account", _links(), requires_cookie=True)
        pages, http = s.dfs(spark)
        run_crawl(spark, cfg1, pages, http, seeds, str(tmp_path / tag))
        assert SnapshotStore(str(tmp_path / tag)).last_committed_round() == 1

        cfg2 = CrawlConfig(sequential_cookies=then)
        resumed = run_crawl(
            spark, cfg2, pages, http, seeds, str(tmp_path / tag), resume=True
        )
        # the cookie set in round 1 is visible after resume in both
        # directions: /account (requires_cookie) crawls, never 403s
        crawled = {r.url for r in resumed.crawled(spark).collect()}
        errors = {r.url for r in resumed.errors(spark).collect()}
        assert f"{BASE}/account" in crawled, (first, then)
        assert f"{BASE}/account" not in errors, (first, then)
