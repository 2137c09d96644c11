"""Deterministic synthetic crawl fixtures (FIXTURES.md §A).

Two families:
  * ``scenario(name)`` — tiny tables that re-express the reference's
    own test scenarios (tests/func + tests/unit of
    /root/reference) as data; consumed by the golden pytest suite.
  * ``synthetic_webgraph`` — a scale-parameterized Common-Crawl-shaped
    domain graph generated *distributively* (spark.range + column
    expressions, nothing driver-side) for bench and skew tests.

Everything is seed-free/deterministic: urls, link structure and bodies
derive from row indices via hashes, so the same inputs reproduce
bit-identical crawls at any scale or parallelism.
"""

from __future__ import annotations

import datetime
import gzip as _gzip
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from node_crawler_spark.config import CrawlConfig

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
HTTP_SCHEMA = (
    "url string, attempt int, status_code int, location string, "
    "content_type string, content_encoding string, content_length string, "
    "error_code string, requires_auth boolean, set_cookie string, "
    "requires_cookie boolean"
)

_TS = datetime.datetime(2025, 1, 1)


@dataclass
class Scenario:
    name: str
    cfg: CrawlConfig
    seeds: list
    pages: list = field(default_factory=list)
    http: list = field(default_factory=list)

    def page(
        self,
        url: str,
        html: str | bytes = "",
        status: int = 200,
        content_type: str | None = "text/html",
        location: str | None = None,
        content_encoding: str | None = None,
        content_length: str | None = None,
        error_code: str | None = None,
        requires_auth: bool = False,
        set_cookie: str | None = None,
        requires_cookie: bool = False,
        attempt: int = 0,
        warc_ts: datetime.datetime = _TS,
        store_body: bool = True,
    ) -> "Scenario":
        body = html.encode("utf-8") if isinstance(html, str) else html
        if store_body and body is not None:
            self.pages.append((url, warc_ts, body, None, "en"))
        self.http.append(
            (url, attempt, status, location, content_type, content_encoding,
             content_length, error_code, requires_auth, set_cookie,
             requires_cookie)
        )
        return self

    def dfs(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        pages = spark.createDataFrame(self.pages or [], PAGES_SCHEMA)
        http = spark.createDataFrame(self.http or [], HTTP_SCHEMA)
        return pages, http


def _links(*hrefs: str) -> str:
    body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    return f"<html><body>{body}</body></html>"


BASE = "http://www.site.test"


def scenario(name: str) -> Scenario:  # noqa: C901 - a catalog is a catalog
    cfg = CrawlConfig()
    s = Scenario(name=name, cfg=cfg, seeds=[f"{BASE}/"])

    if name == "basic_link_crawl":
        # tests/func/crawlerSpec.js:11-25 — root + 1 internal link ⇒ 2 pages
        s.page(f"{BASE}/", _links("/about"))
        s.page(f"{BASE}/about", _links())

    elif name == "external_link_off":
        # crawlerSpec.js:27-41 — crawlExternal=false ⇒ 1 page
        s.page(f"{BASE}/", _links("http://other.test/"))
        s.page("http://other.test/", _links("/never"))

    elif name == "external_link_on":
        # queueSpec.js:25-45 — external fetched HEAD-style, body dropped,
        # links never followed
        s.cfg = CrawlConfig(crawl_external=True)
        s.page(f"{BASE}/", _links("http://other.test/"))
        s.page("http://other.test/", _links("/never"))

    elif name == "relative_links":
        # crawlerSpec.js:43-57, pageSpec.js:74-92 — /abs, sibling, ../up,
        # section/ forms
        s.seeds = [f"{BASE}/deep/start"]
        s.page(f"{BASE}/deep/start", _links("/abs", "sibling", "../up", "section/"))
        s.page(f"{BASE}/abs", _links())
        s.page(f"{BASE}/deep/sibling", _links())
        s.page(f"{BASE}/up", _links())
        s.page(f"{BASE}/deep/section/", _links())

    elif name == "non_page_urls":
        # crawlerSpec.js:59-77 — mailto/javascript/tel + #hash dup ⇒ 1 page
        s.page(
            f"{BASE}/",
            _links("mailto:a@b.test", "javascript:void(0)", "tel:+1555", "#frag",
                   f"{BASE}/#other"),
        )

    elif name == "exclude_patterns":
        # crawlerSpec.js:129-215, queueSpec.js:72-98
        s.cfg = CrawlConfig(exclude_patterns=("/private", "skip.*me"))
        s.page(f"{BASE}/", _links("/private/a", "/SKIPthisME", "/keep"))
        s.page(f"{BASE}/keep", _links())

    elif name == "redirect_chain":
        # redirectSpec.js:53-63 — 301 → final; orig never in crawled sink
        s.page(f"{BASE}/", _links("/old"))
        s.page(f"{BASE}/old", status=301, location="/final", content_type=None,
               store_body=False)
        s.page(f"{BASE}/final", _links())

    elif name == "redirect_multi_hop":
        # _requestSpec.js:197-215 — relative + absolute locations chain
        s.page(f"{BASE}/", _links("/a"))
        s.page(f"{BASE}/a", status=302, location="b", content_type=None, store_body=False)
        s.page(f"{BASE}/b", status=301, location=f"{BASE}/c", content_type=None,
               store_body=False)
        s.page(f"{BASE}/c", _links())

    elif name == "redirect_to_seen":
        # trackingRedirectsSpec.js:83-104 — landing already seen ⇒ page
        # dropped, onRedirect still fired
        s.page(f"{BASE}/", _links("/final", "/old"))
        s.page(f"{BASE}/final", _links())
        s.page(f"{BASE}/old", status=301, location="/final", content_type=None,
               store_body=False)

    elif name == "redirect_infinite":
        # redirectSpec.js:78-94 — self-redirect ⇒ MAX_REDIRECTS_REACHED
        s.page(f"{BASE}/", _links("/loop"))
        s.page(f"{BASE}/loop", status=301, location="/loop", content_type=None,
               store_body=False)

    elif name == "gzip_body":
        # requestSpec.js:104-118 — gzip body, byte-identical decode
        raw = _links("/next") + "<p>some text</p>"
        s.page(f"{BASE}/", _gzip.compress(raw.encode()), content_encoding="gzip")
        s.page(f"{BASE}/next", _links())

    elif name == "non_text_body":
        # requestSpec.js:75-89, crawlerSpec.js:94-127 — pdf ⇒ text '',
        # type kept, no link walk
        s.page(f"{BASE}/", _links("/doc.pdf", "/plain"))
        s.page(f"{BASE}/doc.pdf", b"%PDF-1.4 fake",
               content_type="application/pdf;charset=binary")
        s.page(f"{BASE}/plain", "just words", content_type="text/plain; charset=utf-8")

    elif name == "media_extensions":
        # _requestSpec.js:239-250 — all 25 extensions ⇒ body '' even with
        # text/html content-type
        exts = ("3gp aif asf asx avi flv iff m3u m4a m4p m4v mov mp3 mp4 mpa "
                "mpg mpeg ogg ra raw rm swf vob wav wma wmv").split()
        s.page(f"{BASE}/", _links(*[f"/file.{e}" for e in exts]))
        for e in exts:
            s.page(f"{BASE}/file.{e}", _links("/hidden"), content_type="text/html")

    elif name == "retry_then_ok":
        # onResponseSpec.js:226-276 — attempt0 500, attempt1 200, retries=1
        s.cfg = CrawlConfig(retries=1)
        s.page(f"{BASE}/", _links("/flaky"))
        s.page(f"{BASE}/flaky", status=500, attempt=0, store_body=False)
        s.page(f"{BASE}/flaky", _links(), attempt=1)

    elif name == "retry_exhausted":
        s.cfg = CrawlConfig(retries=0)
        s.page(f"{BASE}/", _links("/flaky"))
        s.page(f"{BASE}/flaky", status=500, attempt=0, store_body=False)
        s.page(f"{BASE}/flaky", _links(), attempt=1)  # never reached

    elif name == "retry_no_content_type":
        # ADVICE r1: the body-download gate reads the PER-RESPONSE
        # contentType (crawler.js:255) — attempt0 fails with text/html,
        # the final 200 has no content-type header ⇒ empty body, no
        # links followed (page.type stays sticky from attempt0)
        s.cfg = CrawlConfig(retries=1)
        s.page(f"{BASE}/", _links("/flaky"))
        s.page(f"{BASE}/flaky", status=500, attempt=0, store_body=False)
        s.page(f"{BASE}/flaky", _links("/hidden"), attempt=1, content_type=None)
        s.page(f"{BASE}/hidden", _links())  # must never be crawled

    elif name == "redirect_dead_hop":
        # ADVICE r1: transport error mid-chain — finalURL is the last
        # hop that RESPONDED (crawler.js `response` var), not the dead
        # hop. /chain2: 2 hops then dead ⇒ landing = the second 30x url;
        # /chain1: 1 hop then dead ⇒ no redirect event at all.
        s.page(f"{BASE}/", _links("/chain2", "/chain1"))
        s.page(f"{BASE}/chain2", status=301, location="/mid",
               content_type=None, store_body=False)
        s.page(f"{BASE}/mid", status=302, location="/dead2",
               content_type=None, store_body=False)
        s.page(f"{BASE}/chain1", status=301, location="/dead1",
               content_type=None, store_body=False)
        # /dead1, /dead2 absent from http_meta = transport errors

    elif name == "http_4xx":
        # callbackSpec.js:123-156 — 4xx ⇒ onError, never onPageCrawl
        s.page(f"{BASE}/", _links("/a", "/b", "/c", "/d"))
        s.page(f"{BASE}/a", status=400, store_body=False)
        s.page(f"{BASE}/b", status=403, store_body=False)
        s.page(f"{BASE}/c", status=404, store_body=False)
        s.page(f"{BASE}/d", status=405, store_body=False)

    elif name == "transport_error":
        # url absent from http_meta = connection failure
        s.page(f"{BASE}/", _links("/gone"))

    elif name == "hpe_external_forgiven":
        # crawler.js:544-553 via callbackSpec.js:179-217
        s.cfg = CrawlConfig(crawl_external=True)
        s.page(f"{BASE}/", _links("http://ext.test/x"))
        s.page("http://ext.test/x", "ignored", content_length="123",
               error_code="HPE_INVALID_CONSTANT")

    elif name == "auth_401":
        # authSpec.js:28-115 — internal 401+auth ⇒ 200; external 401 errors
        s.cfg = CrawlConfig(auth=True, crawl_external=True)
        s.page(f"{BASE}/", _links("/secret", "http://ext.test/secret"))
        s.page(f"{BASE}/secret", _links(), status=401, requires_auth=True)
        s.page("http://ext.test/secret", "", status=401, requires_auth=True,
               store_body=False)

    elif name == "malformed_html":
        # pageSpec.js:45-48 — garbage parses to zero links, no crash
        s.page(f"{BASE}/", "<<$$&($#*(@nonsense<a<<><")

    elif name == "dup_links_one_page":
        # pageSpec.js:54-63 — duplicate href kept in links, crawled once
        s.page(f"{BASE}/", _links("/dup", "/dup"))
        s.page(f"{BASE}/dup", _links())

    elif name == "robots_block":
        # north_star robots extension: disallow prefix blocks queueing
        s.cfg = CrawlConfig(robots=(("www.site.test", "/private"),))
        s.page(f"{BASE}/", _links("/private/a", "/public/b"))
        s.page(f"{BASE}/private/a", _links())
        s.page(f"{BASE}/public/b", _links())

    elif name == "chain4":
        # multi-round BFS chain (resume / checkpoint coverage)
        s.page(f"{BASE}/", _links("/a"))
        s.page(f"{BASE}/a", _links("/b", "/a2"))
        s.page(f"{BASE}/b", _links("/c"))
        s.page(f"{BASE}/a2", _links("/c", "/d"))
        s.page(f"{BASE}/c", _links("/"))
        s.page(f"{BASE}/d", _links())

    elif name == "cookie_redirect":
        # tests/func/cookieSpec.js:44-67 — a 30x hop sets a cookie; the
        # landing requires it. With jar enabled the chain succeeds.
        s.page(f"{BASE}/", _links("/login"))
        s.page(f"{BASE}/login", status=302, location="/account",
               content_type=None, store_body=False, set_cookie="sid=abc")
        s.page(f"{BASE}/account", _links(), requires_cookie=True)

    elif name == "cookie_cross_page":
        # crawl-GLOBAL jar (crawler.js:31-36 — one jar per crawl, not
        # per chain): the seed's 200 response sets a cookie; a linked
        # page fetched a round later requires it. A chain-local model
        # 403s the second page; cookieSpec.js crawl scope succeeds.
        s.page(f"{BASE}/", _links("/member"), set_cookie="sid=abc")
        s.page(f"{BASE}/member", _links(), requires_cookie=True)

    elif name == "cookie_jar_disabled":
        # jar:false — the cookie is never stored ⇒ landing 403s
        s.cfg = CrawlConfig(use_cookies=False)
        s.page(f"{BASE}/", _links("/login"))
        s.page(f"{BASE}/login", status=302, location="/account",
               content_type=None, store_body=False, set_cookie="sid=abc")
        s.page(f"{BASE}/account", _links(), requires_cookie=True)

    elif name == "dup_snapshots":
        # two warc_ts snapshots of one url ⇒ the engine must serve the
        # latest (SURVEY §2.8 date handling; input_hint warc_ts)
        old_ts = datetime.datetime(2024, 6, 1)
        s.pages.append((f"{BASE}/", old_ts, _links("/stale").encode(), None, "en"))
        s.page(f"{BASE}/", _links("/fresh"))  # default _TS = 2025-01-01
        s.page(f"{BASE}/fresh", _links())
        s.page(f"{BASE}/stale", _links())  # reachable only via stale body

    elif name == "port_hosts":
        # explicit ports are part of the host identity (Node
        # url.parse host = hostname:port): the same hostname on a
        # different/absent port is EXTERNAL. Regression golden for
        # the dropped-port hostport bug (Spark parse_url has no PORT
        # key) — pre-fix the engine crawled /q; the simulator never did.
        base8080 = "http://www.site.test:8080"
        s.seeds = [f"{base8080}/"]
        s.page(
            f"{base8080}/",
            _links("/p", "http://www.site.test/q", f"{base8080}/r"),
        )
        s.page(f"{base8080}/p", _links())
        s.page(f"{base8080}/r", _links())
        s.page("http://www.site.test/q", _links())

    elif name == "seed_fragment":
        # queueSpec/pageInit — seed keeps fragment in seen key, fetch
        # strips it (P2 asymmetry)
        s.seeds = [f"{BASE}/page#middle"]
        s.page(f"{BASE}/page", _links())

    elif name == "kitchen_sink":
        # every gate interacting in ONE crawl: robots block + exclude
        # pattern + dup link + external HEAD-fetch + crawl-global
        # cookie (set on the seed, required 3 rounds later) + redirect
        # chain + basic-auth 401 + media-extension body drop + gzip
        # decode + retry-then-ok, across a 6-round BFS. Each feature
        # has its own isolated golden; this pins their INTERACTIONS
        # (shared seen-set, cookie visibility across rounds, auth
        # params frozen per attempt) to the sequential reference.
        s.cfg = CrawlConfig(
            auth=True,
            crawl_external=True,
            retries=1,
            exclude_patterns=("/tmp",),
            robots=(("www.site.test", "/private"),),
        )
        s.page(
            f"{BASE}/",
            _links(
                "/hop", "/private/x", "/tmp/skip", "/dup", "/dup",
                "http://other.test/", "/movie.mp4",
            ),
            set_cookie="sid=abc",
        )
        s.page(f"{BASE}/private/x", _links())      # robots-blocked, never fetched
        s.page(f"{BASE}/tmp/skip", _links())       # excluded, never fetched
        s.page(f"{BASE}/dup", _links("/secret"))
        s.page("http://other.test/", _links("/never"))  # external: no link walk
        s.page(f"{BASE}/movie.mp4", _links("/hidden"), content_type="text/html")
        s.page(f"{BASE}/hop", status=302, location="/landed",
               content_type=None, store_body=False)
        s.page(f"{BASE}/landed", _links("/member"))
        s.page(f"{BASE}/secret", _links("/gz"), status=401, requires_auth=True)
        s.page(f"{BASE}/member", _links("/flaky"), requires_cookie=True)
        raw = _links("/end") + "<p>compressed</p>"
        s.page(f"{BASE}/gz", _gzip.compress(raw.encode()),
               content_encoding="gzip")
        s.page(f"{BASE}/flaky", status=500, attempt=0, store_body=False)
        s.page(f"{BASE}/flaky", _links(), attempt=1)
        s.page(f"{BASE}/end", _links())

    else:
        raise KeyError(f"unknown scenario: {name}")
    return s


ALL_SCENARIOS = [
    "basic_link_crawl", "external_link_off", "external_link_on",
    "relative_links", "non_page_urls", "exclude_patterns",
    "redirect_chain", "redirect_multi_hop", "redirect_to_seen",
    "redirect_infinite", "gzip_body", "non_text_body", "media_extensions",
    "retry_then_ok", "retry_exhausted", "retry_no_content_type",
    "redirect_dead_hop", "http_4xx", "transport_error",
    "hpe_external_forgiven", "auth_401", "malformed_html",
    "dup_links_one_page", "seed_fragment", "robots_block", "chain4",
    "cookie_redirect", "cookie_cross_page", "cookie_jar_disabled",
    "dup_snapshots", "port_hosts", "kitchen_sink",
]


# ---------------------------------------------------------------------------
# Scale generator — Common-Crawl-shaped domain graph, fully distributed
# ---------------------------------------------------------------------------

def synthetic_webgraph(
    spark: SparkSession,
    n_urls: int,
    n_domains: int = 100,
    links_per_page: int = 8,
    error_pct: float = 0.02,
    redirect_pct: float = 0.02,
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, list]:
    """(pages, http_meta, seeds) for an n_urls domain-crawl graph.

    The reference is a *domain* crawler (externals are gated /
    HEAD-only), so the crawlable graph lives on one domain
    ``www.bench.test``: url i links to ``links_per_page`` same-domain
    urls via deterministic hashes (link 0 = i+1, an exact Hamiltonian
    edge, so BFS from p0 reaches every url), plus one external link
    per page to exercise the F2/F3 gates. ``n_domains`` shapes the
    external-link fan. The internal url space lives on ONE domain —
    the graph is maximally hot by construction, which is what a
    politeness budget throttles (the skew-shape politeness tests use
    their own multi-domain frontiers). Bodies are real HTML built
    executor-side; nothing materializes on the driver.
    """
    base = spark.range(0, n_urls, 1, partitions or spark.sparkContext.defaultParallelism)
    url = F.concat(F.lit("http://www.bench.test/p"), F.col("id").cast("string"))
    g = base.withColumn("url", url)

    link_cols = []
    for k in range(links_per_page):
        if k == 0:  # connectivity edge: p(i) → p(i+1 mod n)
            target = F.pmod(F.col("id") + 1, F.lit(n_urls))
        else:
            target = F.pmod(
                F.xxhash64(F.col("id") * 2654435761 + k * 40503 + 17), F.lit(n_urls)
            )
        link_cols.append(
            F.concat(F.lit('<a href="/p'), target.cast("string"), F.lit('">l</a>'))
        )
    ext = F.concat(
        F.lit('<a href="http://ext'),
        F.pmod(F.xxhash64("id"), F.lit(max(n_domains, 1))).cast("string"),
        F.lit('.test/x">e</a>'),
    )
    html = F.concat(F.lit("<html><body>"), *link_cols, ext, F.lit("</body></html>"))

    pages = g.select(
        "url",
        F.lit(_TS).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )

    h = F.pmod(F.xxhash64(F.col("url")), F.lit(10000))
    status = (
        F.when(h < int(error_pct * 10000), F.lit(404))
        .when(h < int((error_pct + redirect_pct) * 10000), F.lit(301))
        .otherwise(F.lit(200))
    )
    location = F.when(
        status == 301,
        F.concat(F.lit("/p"), F.pmod(F.col("id") + 1, F.lit(n_urls)).cast("string")),
    )
    http = g.select(
        "url",
        F.lit(0).alias("attempt"),
        status.cast("int").alias("status_code"),
        location.alias("location"),
        F.when(status != 301, F.lit("text/html; charset=utf-8")).alias("content_type"),
        F.lit(None).cast("string").alias("content_encoding"),
        F.lit(None).cast("string").alias("content_length"),
        F.lit(None).cast("string").alias("error_code"),
        F.lit(False).alias("requires_auth"),
        F.lit(None).cast("string").alias("set_cookie"),
        F.lit(False).alias("requires_cookie"),
    )
    seeds = [g.where(F.col("id") == 0).select("url").first()[0]]
    return pages, http, seeds
