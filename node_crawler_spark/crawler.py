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

Semantics: ``queue()`` collects seeds in order (the reference's
pre-start queueing; queueing after start is the frontier's job);
``start()`` runs the batch crawl to drain, then fires the callbacks in
global seq order — ``pageCrawl(page_row)`` per crawled page,
``error(error_row)`` per failed page, ``redirect(event_row)`` per
redirect event, ``drain()`` once. Callback delivery iterates the
committed sink tables with ``toLocalIterator`` (one partition in
memory at a time) — callbacks are the reference-compat convenience
surface for driver-side consumers; the scale path is the sink tables
themselves (CrawlResult / SnapshotStore), which never funnel through
the driver.

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
        self._handlers: dict[str, list[Callable]] = {e: [] for e in _EVENTS}
        self.result = None  # CrawlResult after start()

    # -- reference API ---------------------------------------------------
    def on(self, event: str, handler: Callable) -> "Crawler":
        if event not in self._handlers:
            raise KeyError(f"unknown event {event!r}; one of {_EVENTS}")
        self._handlers[event].append(handler)
        return self

    def queue(self, url: str, referrer: str | None = None,
              is_external: bool = False) -> "Crawler":
        """Pre-start seed queueing (crawler.js queue()); the queue-gate
        chain (external/exclude/robots/seen) applies at start."""
        self._seeds.append((url, referrer, is_external))
        return self

    def start(self):
        """Run the crawl to drain, then deliver events in seq order.
        Returns the CrawlResult (sink tables, for the scale path)."""
        from node_crawler_spark.plans.driver import run_crawl

        self.result = run_crawl(
            self.spark, self.cfg, self.pages, self.http_meta,
            self._seeds, self.store_root,
        )
        self._deliver()
        return self.result

    # -- event delivery --------------------------------------------------
    def _iter_sorted(self, df: DataFrame | None, *order_cols: str):
        if df is None:
            return
        yield from df.orderBy(*order_cols).toLocalIterator()

    def _deliver(self) -> None:
        h = self._handlers
        if h["pageCrawl"]:
            for row in self._iter_sorted(self.result.crawled(self.spark), "seq"):
                for cb in h["pageCrawl"]:
                    cb(row)
        if h["error"]:
            for row in self._iter_sorted(self.result.errors(self.spark), "seq"):
                for cb in h["error"]:
                    cb(row)
        if h["redirect"]:
            for row in self._iter_sorted(
                self.result.redirects(self.spark), "seq", "clean_final"
            ):
                for cb in h["redirect"]:
                    cb(row)
        for cb in h["drain"]:
            cb()
