"""Facade event semantics vs the reference (crawler.js):

- ONE interleaved event stream in callback order: onRedirect fires
  during the fetch (crawler.js:491), onPageCrawl/onError at completion
  after the page's links queue (:157/:174) — asserted against the
  simulator's global event log.
- kill() (:626-632): stops dispatch at the next round barrier, halts
  delivery mid-stream, drain never fires.
- Mid-crawl queue() (:576-618 is callable any time): urls queued from
  inside a pageCrawl callback join the next round's frontier through
  the full gate chain, with the reference's schedule when the
  enqueueing page is the last of its round.
"""

from __future__ import annotations

from node_crawler_spark.config import CrawlConfig
from node_crawler_spark.crawler import Crawler
from node_crawler_spark.sources.fixtures import BASE, Scenario, _links
from tests.reference_sim import simulate


def _mixed_scenario() -> Scenario:
    """Redirects, an error, and plain pages in one crawl so the three
    event kinds genuinely interleave."""
    s = Scenario(name="facade_mixed", cfg=CrawlConfig(retries=0),
                 seeds=[f"{BASE}/"])
    s.page(f"{BASE}/", _links("/old", "/missing", "/ok"))
    s.page(f"{BASE}/old", status=301, location="/final", content_type=None,
           store_body=False)
    s.page(f"{BASE}/final", _links())
    s.page(f"{BASE}/missing", status=500, content_type=None, store_body=False)
    s.page(f"{BASE}/ok", _links())
    return s


def _sim_event_key(kind, ev):
    if kind == "redirect":
        return (kind, ev["seq"], ev["clean_final"])
    return (kind, ev["seq"], ev["url"])


def test_interleaved_event_order(spark, tmp_path):
    s = _mixed_scenario()
    pages, http = s.dfs(spark)

    log = []
    c = Crawler(spark, pages, http, str(tmp_path / "c"), retries=0)
    c.on("pageCrawl", lambda r: log.append(("pageCrawl", r.seq, r.url)))
    c.on("error", lambda r: log.append(("error", r.seq, r.url)))
    c.on("redirect", lambda r: log.append(("redirect", r.seq, r.clean_final)))
    drained = []
    c.on("drain", lambda: drained.append(True))
    for seed in s.seeds:
        c.queue(seed)
    c.start()

    sim = simulate(s.cfg, s.seeds, s.pages, s.http)
    exp = [_sim_event_key(k, ev) for k, ev in sim.events]
    got = [(k, seq, u) for (k, seq, u) in log]
    # normalize to the same tuple layout
    exp = [(k, seq, u) for (k, seq, u) in exp]
    assert got == exp, f"interleave mismatch:\n got {got}\n exp {exp}"
    assert drained == [True]
    # the redirect event for /old must precede its own terminal AND
    # come after the terminal of every earlier-seq page
    kinds_by_seq = {}
    for i, (k, seq, _u) in enumerate(got):
        kinds_by_seq.setdefault(seq, []).append(k)
    for seq, kinds in kinds_by_seq.items():
        terminals = [k for k in kinds if k in ("pageCrawl", "error")]
        assert len(terminals) == 1
        assert kinds[-1] in ("pageCrawl", "error"), (
            f"seq {seq}: redirects must precede the terminal event"
        )


def _chain_scenario(n: int = 4) -> Scenario:
    """/p0 -> /p1 -> ... one page per BFS round."""
    s = Scenario(name="facade_chain", cfg=CrawlConfig(), seeds=[f"{BASE}/p0"])
    for i in range(n):
        nxt = _links(f"/p{i + 1}") if i + 1 < n else _links()
        s.page(f"{BASE}/p{i}", nxt)
    return s


def test_kill_mid_delivery(spark, tmp_path):
    s = _chain_scenario(4)
    pages, http = s.dfs(spark)

    log, drained = [], []
    c = Crawler(spark, pages, http, str(tmp_path / "k"))

    def on_crawl(row):
        log.append(row.url)
        c.kill()

    c.on("pageCrawl", on_crawl)
    c.on("drain", lambda: drained.append(True))
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()

    # delivery halted after the first event; drain never fired
    assert log == [f"{BASE}/p0"]
    assert drained == []
    # the round loop stopped at its next barrier: p1 was queued by p0
    # but rounds 2+ never ran, so p2 was never discovered
    assert res.rounds == 1
    seen = {r.url for r in res.seen(spark).collect()}
    assert seen == {f"{BASE}/p0", f"{BASE}/p1"}


def test_midcrawl_queue_matches_sim(spark, tmp_path):
    """A pageCrawl callback queues a new url (and a duplicate, which
    the seen gate drops); crawl order matches the simulator running
    the same callback."""
    s = _chain_scenario(2)  # /p0 -> /p1
    s.page(f"{BASE}/extra", _links("/more"))
    s.page(f"{BASE}/more", _links())
    pages, http = s.dfs(spark)

    def drive(queue_fn, row_url):
        if row_url == f"{BASE}/p0":
            queue_fn(f"{BASE}/extra")
            queue_fn(f"{BASE}/p1")  # already seen -> gate drops it

    log = []
    c = Crawler(spark, pages, http, str(tmp_path / "q"))
    c.on("pageCrawl",
         lambda row: (log.append((row.seq, row.url)),
                      drive(c.queue, row.url)))
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()

    sim = simulate(
        s.cfg, s.seeds, s.pages, s.http,
        on_page_crawl=lambda row, q: drive(q, row["url"]),
    )
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    assert [r.url for r in seen_rows] == sim.seen
    assert [r.seq for r in seen_rows] == list(range(1, len(sim.seen) + 1))
    assert log == [(c_["seq"], c_["url"])
                   for c_ in sorted(sim.crawled, key=lambda x: x["seq"])]
    # /extra was crawled and ITS links were followed
    assert f"{BASE}/more" in {u for _s, u in log}


def test_midround_queue_exact_insertion_matches_sim(spark, tmp_path):
    """The general case the r3 deviation left open: a url queue()d from
    a MID-round page's callback (NOT the round's last page) must slot
    after that page's own links and BEFORE later pages' links
    (crawler.js:157 + :576-618) — including first-wins against a later
    page's link to the same url. Pinned against the simulator running
    the identical callback."""
    s = Scenario(name="facade_midround_queue", cfg=CrawlConfig(),
                 seeds=[f"{BASE}/a", f"{BASE}/b"])
    s.page(f"{BASE}/a", _links("/a1"))
    s.page(f"{BASE}/b", _links("/b1", "/x"))  # /x loses to the queued /x
    s.page(f"{BASE}/a1", _links())
    s.page(f"{BASE}/b1", _links())
    s.page(f"{BASE}/x", _links("/x1"))
    s.page(f"{BASE}/x1", _links())
    s.page(f"{BASE}/q", _links())
    pages, http = s.dfs(spark)

    def drive(queue_fn, row_url):
        if row_url == f"{BASE}/a":
            queue_fn(f"{BASE}/x")   # beats /b's link to /x (earlier anchor)
            queue_fn(f"{BASE}/q")

    log = []
    c = Crawler(spark, pages, http, str(tmp_path / "mq"))
    c.on("pageCrawl",
         lambda row: (log.append((row.seq, row.url)),
                      drive(c.queue, row.url)))
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()

    sim = simulate(
        s.cfg, s.seeds, s.pages, s.http,
        on_page_crawl=lambda row, q: drive(q, row["url"]),
    )
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    # the exact global insertion order: a b a1 x q b1 x1 — x and q sit
    # between a's links and b's links, and /b's duplicate /x vanished
    assert [r.url for r in seen_rows] == sim.seen
    assert sim.seen == [f"{BASE}/a", f"{BASE}/b", f"{BASE}/a1", f"{BASE}/x",
                        f"{BASE}/q", f"{BASE}/b1", f"{BASE}/x1"]
    assert [r.seq for r in seen_rows] == list(range(1, len(sim.seen) + 1))
    assert log == [(c_["seq"], c_["url"])
                   for c_ in sorted(sim.crawled, key=lambda x: x["seq"])]
    # the queued /x was crawled and ITS links followed
    assert f"{BASE}/x1" in {u for _s, u in log}


def test_redirect_callback_queue_inserts_before_links(spark, tmp_path):
    """The last r4 ordering deviation: crawler.js:484-492 fires
    onRedirect right after the landing's seen-insert — BEFORE the
    landing page's links are extracted and queued (:157). A queue()
    from the onRedirect callback must therefore slot between the
    landing insert and the page's own links (engine: ordering band
    2*event_idx+1), and first-wins against a later page's link to the
    same url. Pinned against the simulator running the identical
    callback."""
    s = Scenario(name="facade_redirect_queue", cfg=CrawlConfig(retries=0),
                 seeds=[f"{BASE}/r", f"{BASE}/b"])
    s.page(f"{BASE}/r", status=301, location="/final", content_type=None,
           store_body=False)
    s.page(f"{BASE}/final", _links("/rl"))
    s.page(f"{BASE}/b", _links("/q", "/bl"))  # /q loses to the queued /q
    s.page(f"{BASE}/rl", _links())
    s.page(f"{BASE}/bl", _links())
    s.page(f"{BASE}/q", _links("/q1"))
    s.page(f"{BASE}/q1", _links())
    pages, http = s.dfs(spark)

    def drive(queue_fn, seq):
        if seq == 1:  # /r's redirect event
            queue_fn(f"{BASE}/q")

    c = Crawler(spark, pages, http, str(tmp_path / "rq"), retries=0)
    c.on("redirect", lambda row: drive(c.queue, row.seq))
    log = []
    c.on("pageCrawl", lambda row: log.append((row.seq, row.url)))
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()

    sim = simulate(
        s.cfg, s.seeds, s.pages, s.http,
        on_redirect=lambda ev, q: drive(q, ev["seq"]),
    )
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    # exact global insertion order: r b final q rl bl q1 — the queued
    # /q sits between /r's landing and /r's own link /rl, and /b's
    # duplicate link to /q vanished (first wins at the earlier anchor)
    assert [r.url for r in seen_rows] == sim.seen
    assert sim.seen == [f"{BASE}/r", f"{BASE}/b", f"{BASE}/final",
                        f"{BASE}/q", f"{BASE}/rl", f"{BASE}/bl",
                        f"{BASE}/q1"]
    assert [r.seq for r in seen_rows] == list(range(1, len(sim.seen) + 1))
    assert log == [(c_["seq"], c_["url"])
                   for c_ in sorted(sim.crawled, key=lambda x: x["seq"])]
    # the queued /q was crawled and ITS links followed
    assert f"{BASE}/q1" in {u for _s, u in log}

def test_redirect_queue_drops_own_page_in_sinks(spark, tmp_path):
    """The pathological corner of onRedirect queue(): the reference
    fires onRedirect once per ATTEMPT, after that attempt's landing
    seen-insert (crawler.js:484-500), so queueing the current landing
    is a no-op — but a url queued by attempt 0's callback collides
    with attempt 1's (retry) landing, and the page drops ITSELF
    (:497-500): its pageCrawl never fires in the reference and the
    queued url is crawled as its own page. The committed sinks must
    reproduce that exactly; the live stream is the documented
    deviation (COVERAGE.md): pass-1 delivery already fired the
    dropped page's terminal event and cannot retract it."""
    s = Scenario(name="facade_self_drop", cfg=CrawlConfig(retries=1),
                 seeds=[f"{BASE}/start"])
    # attempt 0: /start 301-> /err, /err answers 500 (retry trigger);
    # the attempt's redirect event fires with clean_final=/err and the
    # callback queues /x. attempt 1 refetches /err: 301-> /x — landing
    # /x is now seen (queued) -> page drops itself.
    s.page(f"{BASE}/start", status=301, location="/err",
           content_type=None, store_body=False)
    s.page(f"{BASE}/err", status=500, content_type=None, store_body=False)
    s.page(f"{BASE}/err", status=301, location="/x", content_type=None,
           store_body=False, attempt=1)
    s.page(f"{BASE}/x", _links("/after"))
    s.page(f"{BASE}/x", status=200, store_body=False, attempt=1)
    s.page(f"{BASE}/after", _links())
    pages, http = s.dfs(spark)

    def drive(queue_fn, clean_final):
        if clean_final == f"{BASE}/err":  # attempt 0's redirect event
            queue_fn(f"{BASE}/x")

    c = Crawler(spark, pages, http, str(tmp_path / "sd"), retries=1)
    c.on("redirect", lambda row: drive(c.queue, row.clean_final))
    log = []
    c.on("pageCrawl", lambda row: log.append((row.seq, row.url)))
    for seed in s.seeds:
        c.queue(seed)
    res = c.start()

    sim = simulate(
        s.cfg, s.seeds, s.pages, s.http,
        on_redirect=lambda ev, q: drive(q, ev["clean_final"]),
    )
    # committed sinks reference-exact: the seed page dropped itself,
    # the queued /x crawled as its own page, /after reached through it
    crawled = [(r.seq, r.url)
               for r in res.crawled(spark).orderBy("seq").collect()]
    assert crawled == [(c_["seq"], c_["url"])
                       for c_ in sorted(sim.crawled, key=lambda x: x["seq"])]
    assert 1 not in {q for q, _u in crawled}          # seed page dropped
    assert {u for _q, u in crawled} == {f"{BASE}/x", f"{BASE}/after"}
    seen_rows = sorted(res.seen(spark).collect(), key=lambda r: r.seq)
    assert [r.url for r in seen_rows] == sim.seen
    assert sim.seen == [f"{BASE}/start", f"{BASE}/err", f"{BASE}/x",
                        f"{BASE}/after"]
    # the documented deviation, pinned: pass-1 delivery fired the
    # dropped page's terminal event (seq 1), which the simulator's
    # stream never contains
    assert 1 in {q for q, _u in log}
    assert 1 not in {c_["seq"] for c_ in sim.crawled}
