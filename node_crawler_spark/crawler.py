"""Crawler — the reference's public API surface, 1:1 (crawler.js:10-51,
debugger.js usage):

    var crawler = new Crawler({crawlExternal: ..., retries: ...});
    crawler.on('pageCrawl', cb); crawler.on('error', cb);
    crawler.on('redirect', cb); crawler.on('drain', cb);
    crawler.queue(url, referrer, isExternal);
    crawler.start();

becomes

    c = Crawler(spark, pages, http_meta, store_root,
                crawl_external=..., retries=...)
    c.on("pageCrawl", cb); c.on("error", cb)
    c.on("redirect", cb); c.on("drain", cb)
    c.queue(url); c.start()

Semantics: ``queue()`` is callable any time, like the reference's
(crawler.js:576-618) — pre-start calls collect seeds; calls from
inside a callback anchor at the enqueueing page and join the SAME
round's insert stream at the reference's exact insertion point (see
below), through the same gate chain. ``start()`` runs the crawl; each
round's events fire mid-round (after the round's sinks resolve, before
it commits) as ONE interleaved stream in the reference's callback
order (crawler.js:491 fires onRedirect during the fetch, :157/:174
fire onPageCrawl/onError at completion, after the page's links are
queued): within a round pages deliver in schedule (seq) order, and
within a page every redirect event precedes the terminal
pageCrawl/error. ``drain()`` fires once at the end — unless ``kill()``
ran (crawler.js:626-632: a killed queue never drains). Callback
delivery iterates the round's sink DataFrames with
``toLocalIterator`` (one partition in memory at a time) — callbacks
are the reference-compat convenience surface for driver-side
consumers; the scale path is the sink tables themselves
(CrawlResult / SnapshotStore), which never funnel through the driver.

Mid-crawl ordering (exact since r4): a url queue()d from a callback
of page X re-enters the SAME round's insert resolution anchored at
X's seq, at the reference's sequential insertion point — a
terminal-callback queue() after X's own links (crawler.js:157 fires
the callback after the page's links queued; queue() pushes
immediately, :576-618), an onRedirect-callback queue() right after
that hop's landing insert and BEFORE X's links (:484-492 inserts the
landing, fires onRedirect, and link extraction happens later at
:157) — before every later page's inserts either way. Delivery
therefore happens mid-round, before the round commits (the reference
also fires events before the crawl "commits" anything). Remaining
caveat (COVERAGE.md): in the pathological case where a queued url
equals a LATER same-round page's redirect landing, that page's
already-delivered events can't be retracted (the committed sinks are
consistent either way).

Constructor knobs mirror crawler.js names (camelCase accepted via
**kwargs): crawlExternal, excludePatterns, retries, workers, auth,
jar/use_cookies — plus every CrawlConfig extension (politeness,
robots, priority, ...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from node_crawler_spark.config import CrawlConfig

_EVENTS = ("pageCrawl", "error", "redirect", "drain")

# crawler.js ctor option -> CrawlConfig field
_OPTION_ALIASES = {
    "crawlExternal": "crawl_external",
    "excludePatterns": "exclude_patterns",
    "jar": "use_cookies",
    "maxRedirects": "max_redirects",
}


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame,
        http_meta: DataFrame,
        store_root: str,
        **options,
    ) -> None:
        self.spark = spark
        self.pages = pages
        self.http_meta = http_meta
        self.store_root = store_root
        cfg_kwargs = {}
        for k, v in options.items():
            k = _OPTION_ALIASES.get(k, k)
            if k == "exclude_patterns":
                v = tuple(v)
            cfg_kwargs[k] = v
        self.cfg = CrawlConfig(**cfg_kwargs)
        self._seeds: list = []
        self._pending: list = []        # queue()d outside any callback
        self._anchored: list = []       # queue()d from a callback: (anchor_seq, ...)
        self._delivering_seq = None     # seq of the event being delivered
        self._delivering_event = None   # redirect event_idx, None if terminal
        self._handlers: dict[str, list[Callable]] = {e: [] for e in _EVENTS}
        self._started = False
        self._killed = False
        self.result = None  # CrawlResult after start()

    # -- reference API ---------------------------------------------------
    def on(self, event: str, handler: Callable) -> "Crawler":
        if event not in self._handlers:
            raise KeyError(f"unknown event {event!r}; one of {_EVENTS}")
        self._handlers[event].append(handler)
        return self

    def queue(self, url: str, referrer: str | None = None,
              is_external: bool = False) -> "Crawler":
        """Callable any time (crawler.js queue(), :576-618). Pre-start
        calls collect seeds. Calls from inside a callback anchor at the
        event's page: the url joins the CURRENT round's insert stream
        at the reference's exact insertion point — right after the
        page's own links from a terminal pageCrawl/error callback,
        right after the firing hop's landing insert (before the links)
        from an onRedirect callback. Rare non-callback mid-crawl calls
        fall back to the next round's frontier. The queue-gate chain
        (external/exclude/robots/seen) applies in every case."""
        if self._delivering_seq is not None:
            self._anchored.append(
                (self._delivering_seq, self._delivering_event,
                 url, referrer, is_external)
            )
        elif self._started:
            self._pending.append((url, referrer, is_external))
        else:
            self._seeds.append((url, referrer, is_external))
        return self

    def kill(self) -> None:
        """crawler.js kill() (:626-632): stop dispatching queued work
        and silence future delivery — drain never fires. Persists the
        driver's KILL marker so the round loop stops at its next
        barrier; committed rounds stay intact (and, unlike the
        reference, CAN resume later once the marker is removed)."""
        import os

        self._killed = True
        os.makedirs(self.store_root, exist_ok=True)
        with open(os.path.join(self.store_root, "KILL"), "w"):
            pass

    def start(self):
        """Run the crawl, delivering each round's events as it
        commits. Returns the CrawlResult (sink tables, the scale
        path).

        Delivery semantics: events fire BEFORE the round commits —
        required for exact queue() anchoring (a callback's urls join
        the enqueueing round's own expansion, crawler.js:576-618), and
        matching the reference, where callbacks run mid-crawl and a
        throwing callback aborts the crawl. The distributed price the
        in-process reference never pays: if the driver dies after
        delivery but before the round's commit, resume re-runs the
        round and re-fires its events — delivery is AT-LEAST-ONCE
        across crash/resume (exactly-once within a run). External
        consumers that resume a crawl should dedupe on (round, seq,
        event_idx), which is stable across re-runs. See COVERAGE.md."""
        from node_crawler_spark.plans.driver import run_crawl

        self._started = True

        def _live(r, tables):
            # mid-round delivery: fire this round's events now (the
            # reference fires during the crawl) and hand back the urls
            # callbacks queue()d, anchored at the enqueueing page's seq
            self._anchored = []
            if not self._killed:
                self._deliver_tables(tables)
            out, self._anchored = self._anchored, []
            return [] if self._killed else out

        def _hook(r, store):
            # non-anchored queue() calls (outside callbacks) join the
            # next round's frontier, after the committed watermark
            out, self._pending = self._pending, []
            return [] if self._killed else out

        self.result = run_crawl(
            self.spark, self.cfg, self.pages, self.http_meta,
            self._seeds, self.store_root,
            on_round=_hook, on_round_live=_live,
        )
        if not self._killed:
            for cb in self._handlers["drain"]:
                cb()
        return self.result

    # -- event delivery --------------------------------------------------
    def _deliver_tables(self, tables: dict) -> None:
        """One interleaved stream per round: a lazy 3-way sorted merge
        of the round's sink DataFrames on (seq, kind, event_idx) — kind
        0 = redirect events (they fire during the fetch,
        crawler.js:491), kind 1 = the page's terminal pageCrawl/error
        (:157/:174). Each leg streams via toLocalIterator; only the
        heap heads are in driver memory. While an event's callbacks
        run, ``_delivering_seq`` carries its page's seq so queue()
        calls anchor at the reference's exact insertion point."""
        import heapq

        h = self._handlers

        def _leg(df, event, keyfn):
            for row in df.toLocalIterator():
                yield keyfn(row), event, row

        legs = []
        if h["redirect"]:
            df = tables.get("redirects")
            if df is not None:
                legs.append(_leg(
                    df.orderBy("seq", "event_idx"), "redirect",
                    lambda row: (row.seq, 0, row.event_idx),
                ))
        for table, event in (("crawled", "pageCrawl"), ("errors", "error")):
            if not h[event]:
                continue
            df = tables.get(table)
            if df is not None:
                legs.append(_leg(
                    df.orderBy("seq"), event, lambda row: (row.seq, 1, 0)
                ))
        try:
            for _key, event, row in heapq.merge(*legs, key=lambda t: t[0]):
                if self._killed:
                    break
                self._delivering_seq = row.seq
                self._delivering_event = (
                    row.event_idx if event == "redirect" else None
                )
                for cb in h[event]:
                    cb(row)
        finally:
            self._delivering_seq = None
            self._delivering_event = None
