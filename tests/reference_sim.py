"""Pure-Python oracle simulator of the reference crawler's semantics.

Plays the role DuckDB plays for the relational queries: an independent,
sequential implementation of /root/reference/crawler.js's observable
behavior (workers=1, FIFO) over the same synthetic fetch tables the
Spark engine consumes. Golden tests assert the Spark pipeline's seen
set, crawl schedule, sink rows and extracted text match this simulator
exactly, scenario by scenario.

Scalar kernels (node_href / node_resolve / extract_links_py /
decode_body_py) are shared with the engine — they are pinned
independently against the reference's unit-spec corpus in
tests/test_urlkit.py / test_html.py, so sharing them here does not
mask pipeline bugs (ordering, dedup, redirect bookkeeping, gating),
which is what this simulator exists to catch.

Semantics map (file:line = /root/reference/crawler.js):
  queue gates :576-618; FIFO dispatch :24-26; redirect following and
  the >9 cap :265-293; redirect bookkeeping :474-542; HPE forgiveness
  :544-553; retry-in-place :558-570; content gate :323-336; link walk
  :132-155; type normalization :466-469.
"""

from __future__ import annotations

import re
from collections import deque
from dataclasses import dataclass, field

from node_crawler_spark.functions.html import decode_body_py, extract_links_py
from node_crawler_spark.functions.urlkit import (
    node_href,
    node_parse,
    node_resolve,
    strip_fragment,
)

MEDIA_RE = re.compile(
    r"\.(?:3gp|aif|asf|asx|avi|flv|iff|m3u|m4a|m4p|m4v|mov|mp3|mp4|mpa|mpg|"
    r"mpeg|ogg|ra|raw|rm|swf|vob|wav|wma|wmv)$"
)


def is_external_pair(base: str, url: str) -> bool:
    a, b = node_parse(base), node_parse(url)
    return a["protocol"] != b["protocol"] or a["host"] != b["host"]


@dataclass
class SimPage:
    url: str            # fragment-stripped (Page ctor, crawler.js:66)
    ctor_href: str      # urlData.href — never updated on redirect
    referrer: str | None
    is_external: bool
    crawl_links: bool   # frozen at queue time (crawler.js:612)
    seq: int
    depth: int = 0
    type: str = ""
    redirects: list = field(default_factory=list)


@dataclass
class SimResult:
    seen: list          # canonical hrefs, insertion order (seq = index+1)
    crawled: list       # dicts per onPageCrawl
    errors: list        # dicts per onError
    redirect_events: list  # dicts per onRedirect
    events: list = field(default_factory=list)
    # ^ the global callback interleave: ("redirect"|"pageCrawl"|"error",
    #   dict) in firing order — onRedirect during the fetch
    #   (crawler.js:491), the terminal after links queue (:157/:174)


def simulate(cfg, seeds, pages_rows, http_rows, workers: int = 1,
             completion_order=None, on_page_crawl=None,
             on_redirect=None) -> SimResult:
    """``workers`` models the reference's K-worker async queue
    (crawler.js:23-26): up to K pages are dispatched FIFO as a batch;
    ``completion_order`` (a callable batch→batch) permutes the order
    their completions are processed in — the nondeterminism real
    concurrent fetches introduce. Dispatch order is always FIFO.
    workers=1 is the sequential oracle the goldens pin."""
    # latest snapshot per url (warc_ts desc) — matches the engine's pick
    page_store: dict[str, tuple] = {}
    for url, warc_ts, html, _text, _lang in pages_rows:
        cur = page_store.get(url)
        if cur is None or (warc_ts and cur[0] and warc_ts > cur[0]):
            page_store[url] = (warc_ts, html)

    meta: dict[tuple[str, int], dict] = {}
    last_attempt: dict[str, dict] = {}
    for row_t in http_rows:
        (url, attempt, status, location, ct, ce, cl, err, req_auth,
         *cookie_cols) = row_t
        set_cookie = cookie_cols[0] if cookie_cols else None
        req_cookie = bool(cookie_cols[1]) if len(cookie_cols) > 1 else False
        row = dict(status=status, location=location, ct=ct, ce=ce, cl=cl,
                   err=err, req_auth=bool(req_auth), set_cookie=set_cookie,
                   req_cookie=req_cookie)
        meta[(url, attempt)] = row
        if url not in last_attempt or attempt >= last_attempt[url]["_a"]:
            last_attempt[url] = {**row, "_a": attempt}

    def lookup(url: str, attempt: int):
        row = meta.get((url, attempt))
        if row is None:
            row = last_attempt.get(url)
        return row

    seen: list[str] = []
    seen_set: set[str] = set()
    queue: deque[SimPage] = deque()
    crawled, errors, redirect_events, events = [], [], [], []

    def robots_blocked(href: str) -> bool:
        if not cfg.robots:
            return False
        from node_crawler_spark.operators.robots import (
            normalize_robots_rules,
            robots_allowed,
        )

        d = node_parse(href)
        host = d["host"]
        pathq = d["pathname"] + d["search"]
        rules = [
            (pat, allow)
            for dom, pat, allow in normalize_robots_rules(cfg.robots)
            if dom == host
        ]
        return not robots_allowed(rules, pathq)

    def enqueue(url: str, referrer, is_external: bool, depth: int = 0) -> bool:
        # crawler.js:576-618 — gate order matters
        if is_external and not cfg.crawl_external:
            return False
        href = node_href(url)
        if href in seen_set:
            return False
        for pat in cfg.exclude_patterns:
            if re.search(pat, href, re.IGNORECASE):
                return False
        if robots_blocked(href):
            return False
        seen.append(href)
        seen_set.add(href)
        queue.append(
            SimPage(
                url=strip_fragment(href),
                ctor_href=href,
                referrer=referrer,
                is_external=is_external,
                crawl_links=not is_external,
                seq=len(seen),
                depth=depth,
            )
        )
        return True

    for s in seeds:
        if isinstance(s, str):
            enqueue(s, None, False)
        else:
            url, referrer, is_external = (tuple(s) + (None, False))[:3]
            enqueue(url, referrer, bool(is_external))

    # crawl-global jar with round-barrier visibility: cookies set by
    # pages at depth < d are visible to a page at depth d (the engine's
    # BFS round r fetches depth r-1, so "committed by an earlier round"
    # == "set at a strictly smaller depth" when politeness is off)
    committed_cookies: dict[int, set] = {}

    def _process(page: SimPage) -> None:
        dropped = False
        outcome = None  # (ok, status, err, ct_raw, ce, params_url)

        visible: set[str] = set()
        for d, doms in committed_cookies.items():
            # sequential mode: every cookie committed by a previously
            # processed page is visible (the workers=1 reference);
            # default: the engine's deterministic round barrier
            # (committed at a strictly smaller depth)
            if getattr(cfg, "sequential_cookies", False) or d < page.depth:
                visible |= doms
        jar: set[str] = set()  # chain-local cookie domains (crawler.js:272-278)
        for attempt in range(cfg.retries + 1):
            params_url = page.url
            params_external = page.is_external  # frozen per attempt
            cur = page.url
            hops = 0
            resp_url = None  # last hop that actually responded (crawler.js `response`)
            # _request redirect-following loop (crawler.js:265-293)
            while True:
                row = lookup(cur, attempt)
                if row is None:
                    status, err, ct, ce, cl = None, "ENOTFOUND", None, None, None
                    break
                status, err = row["status"], row["err"]
                ct, ce, cl = row["ct"], row["ce"], row["cl"]
                if (row["req_auth"] and cfg.auth and not params_external
                        and status == 401):
                    status = 200  # crawler.js:301-312
                if row.get("req_cookie"):
                    dom = node_parse(cur)["hostname"]
                    if not cfg.use_cookies or (dom not in jar
                                               and dom not in visible):
                        status = 403  # cookie gate (cookieSpec.js model)
                if (status is not None and str(status).startswith("30")
                        and row["location"]):
                    if hops > cfg.max_redirects:
                        err = "MAX_REDIRECTS_REACHED"
                        break
                    if row.get("set_cookie") and cfg.use_cookies:
                        jar.add(node_parse(cur)["hostname"])
                    hops += 1
                    resp_url = cur  # this 30x hop responded
                    cur = node_resolve(cur, row["location"])
                    continue
                break

            # finalURL = the last url that responded: the current hop if
            # it answered, else the prior 30x hop (a transport error
            # mid-chain leaves crawler.js's `response` var at hop N-1)
            landing = cur if status is not None else (
                resp_url if resp_url is not None else page.url
            )

            # terminal responses with Set-Cookie also feed the jar
            if (cfg.use_cookies and status is not None and row is not None
                    and row.get("set_cookie")):
                jar.add(node_parse(cur)["hostname"])

            if ct is not None:  # crawler.js:466-469 — sticky type
                page.type = re.sub(r";.*", "", ct).strip()

            # redirect bookkeeping (crawler.js:521-542)
            if landing != page.url:
                if not page.is_external and is_external_pair(page.url, landing):
                    page.is_external = True
                clean = node_href(landing)
                ev = dict(seq=page.seq, pre_url=page.url, final_url=landing,
                          clean_final=clean, status_code=status,
                          redirects_before=list(page.redirects))
                redirect_events.append(ev)
                events.append(("redirect", ev))
                was = clean in seen_set
                if not was:
                    seen.append(clean)
                    seen_set.add(clean)
                if on_redirect is not None:
                    # crawler.js:484-492 — the landing seen-insert
                    # happens FIRST, then onRedirect fires (even when
                    # wasAdded drops the page), so a queue() from the
                    # callback inserts right here: after this event's
                    # landing, before the next hop's and before the
                    # page's links
                    def _rqueue(url, referrer=None, is_external=False):
                        return enqueue(url, referrer,
                                       bool(is_external), page.depth + 1)

                    on_redirect(ev, _rqueue)
                page.redirects.append(page.url)
                page.url = clean
                if was:
                    dropped = True  # crawler.js:497-500 — return null
                    break

            # HPE forgiveness (crawler.js:544-553)
            if (err == "HPE_INVALID_CONSTANT" and cl is not None
                    and status == 200 and page.is_external):
                err = None

            ok = err is None and status == 200
            outcome = (ok, status, err, ct, ce, params_url, params_external)
            if ok or attempt >= cfg.retries:
                break

        # whatever happened (ok / error / dropped), cookies the chain
        # stored are committed for later depths
        if jar:
            committed_cookies.setdefault(page.depth, set()).update(jar)

        if dropped or outcome is None:
            return

        ok, status, err, ct_raw, ce, params_url, params_external = outcome
        if ok:
            # content gate (crawler.js:323-336) — attempt-frozen externality
            body = ""
            if (ct_raw is not None and "text/" in ct_raw
                    and not MEDIA_RE.search(params_url)
                    and not params_external):
                snap = page_store.get(page.url)
                if snap is not None:
                    body = decode_body_py(snap[1], ce == "gzip")
            links = [node_resolve(page.url, h) for h in extract_links_py(body)]
            if page.crawl_links:  # crawlLinks frozen at queue (crawler.js:612, :132)
                for link in links:
                    d = node_parse(link)
                    if d["protocol"] in ("mailto:", "javascript:", "tel:") or d["host"] == "":
                        continue
                    ext = is_external_pair(page.ctor_href, link)
                    enqueue(strip_fragment(link), page.url, ext, page.depth + 1)
            row = dict(seq=page.seq, url=page.url, queued_url=page.ctor_href,
                       referrer=page.referrer, is_external=page.is_external,
                       type=page.type, text=body, links=links,
                       redirects=list(page.redirects))
            crawled.append(row)
            events.append(("pageCrawl", row))
            if on_page_crawl is not None:
                # user-land queue() from inside onPageCrawl — fires
                # AFTER the page's links queued (crawler.js:157)
                def _queue(url, referrer=None, is_external=False):
                    return enqueue(url, referrer,
                                   bool(is_external), page.depth + 1)

                on_page_crawl(row, _queue)
        else:
            row = dict(seq=page.seq, url=page.url, queued_url=page.ctor_href,
                       referrer=page.referrer, is_external=page.is_external,
                       type=page.type, error_code=err, status_code=status)
            errors.append(row)
            events.append(("error", row))

    while queue:
        batch = [queue.popleft() for _ in range(min(workers, len(queue)))]
        if completion_order is not None:
            batch = completion_order(batch)
        for page in batch:
            _process(page)

    return SimResult(seen=seen, crawled=crawled, errors=errors,
                     redirect_events=redirect_events, events=events)
