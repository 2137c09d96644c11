"""Golden scenario suite — Spark engine vs the sequential reference
simulator (tests/reference_sim.py), one scenario per reference test
family (FIXTURES.md §A4, SURVEY.md §5).

Asserts, per scenario:
  (a) final seen set — exact urls in exact insertion order (seq),
  (b) crawl schedule + onPageCrawl rows: url, referrer, externality,
      type, byte-identical text, links in document order, redirects,
  (c) onError rows: error code + status,
  (d) onRedirect events.
"""

from __future__ import annotations

import pytest

from node_crawler_spark.plans.driver import run_crawl
from node_crawler_spark.sources.fixtures import ALL_SCENARIOS, scenario
from tests.reference_sim import simulate


def _run(spark, tmp_path, name):
    s = scenario(name)
    pages, http = s.dfs(spark)
    res = run_crawl(spark, s.cfg, pages, http, s.seeds, str(tmp_path / name))
    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    return res, sim


@pytest.mark.parametrize("name", ALL_SCENARIOS)
def test_scenario(spark, tmp_path, name):
    res, sim = _run(spark, tmp_path, name)

    # (a) seen set: urls in insertion order, dense seqs from 1
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    assert [r.url for r in seen_rows] == sim.seen, "seen-set order mismatch"
    assert [r.seq for r in seen_rows] == list(range(1, len(sim.seen) + 1))

    # (b) crawled sink
    crawled = res.crawled(spark)
    got = {r.seq: r for r in crawled.collect()} if crawled is not None else {}
    exp = {c["seq"]: c for c in sim.crawled}
    assert sorted(got) == sorted(exp), (
        f"crawled seqs differ: got {sorted(got)} want {sorted(exp)}"
    )
    for q in exp:
        g, e = got[q], exp[q]
        assert g.url == e["url"], f"seq {q} url"
        assert g.queued_url == e["queued_url"], f"seq {q} queued_url"
        assert g.referrer == e["referrer"], f"seq {q} referrer"
        assert bool(g.is_external) == bool(e["is_external"]), f"seq {q} ext"
        assert g.type == e["type"], f"seq {q} type"
        assert g.text == e["text"], f"seq {q} text not byte-identical"
        assert list(g.links) == list(e["links"]), f"seq {q} links"
        assert list(g.redirects) == list(e["redirects"]), f"seq {q} redirects"

    # (c) errors sink
    errors = res.errors(spark)
    got_e = {r.seq: r for r in errors.collect()} if errors is not None else {}
    exp_e = {c["seq"]: c for c in sim.errors}
    assert sorted(got_e) == sorted(exp_e), (
        f"error seqs differ: got {sorted(got_e)} want {sorted(exp_e)}"
    )
    for q in exp_e:
        g, e = got_e[q], exp_e[q]
        assert g.url == e["url"], f"err {q} url"
        assert g.error_code == e["error_code"], f"err {q} code"
        assert g.status_code == e["status_code"], f"err {q} status"
        assert g.type == e["type"], f"err {q} type"

    # (d) redirect events
    redirects = res.redirects(spark)
    got_r = sorted(
        [(r.seq, r.pre_url, r.final_url, r.clean_final) for r in redirects.collect()]
        if redirects is not None else []
    )
    exp_r = sorted(
        (c["seq"], c["pre_url"], c["final_url"], c["clean_final"])
        for c in sim.redirect_events
    )
    assert got_r == exp_r, "redirect events mismatch"
