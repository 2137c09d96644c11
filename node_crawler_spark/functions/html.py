"""HTML / body functions: link extraction (P5) and body decode (P7).

Reference behavior:
  * crawler.js:93-107 — cheerio ``$('a').each`` collects the ``href``
    attribute of every anchor, in document order; falsy hrefs (missing
    or empty string) are skipped; links are reset on every setHTML.
  * crawler.js:70-87 — parse errors must not kill the process; garbage
    input yields an empty DOM (tests/func/pageSpec.js:45-48,
    tests/unit/page/pageDOMSpec.js:13-19).
  * crawler.js:343-357 — gzip bodies are zlib.unzip'ed then
    ``Buffer.toString()``-ed (UTF-8, invalid sequences → U+FFFD). The
    decoded text is the engine's byte-identical-per-URL invariant.

cheerio 0.12 sits on htmlparser2 (lenient, non-validating). The
stdlib ``html.parser.HTMLParser`` has the same forgiving behavior
(no exceptions on malformed markup, entity decoding in attribute
values), so it is the in-container choice; at production scale you
would swap the inner loop for selectolax/lxml — the Spark-side
contract (Arrow batch in, list<string> column out) is unchanged.
"""

from __future__ import annotations

import zlib
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


class _AnchorCollector(HTMLParser):
    """Collect href of every <a> in document order (cheerio-equivalent)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for name, value in attrs:
                if name == "href":
                    if value:  # JS truthiness: skip missing AND ''
                        self.hrefs.append(value)
                    break

    # <a/> appears as startendtag in some parsers
    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def error(self, message: str) -> None:  # pragma: no cover - py<3.10 compat
        pass


class _AnchorTextCollector(HTMLParser):
    """Collect (href, text) of every <a> in document order — the
    anchor-text extension beyond the reference (crawler.js only keeps
    hrefs; anchor text is the link-graph/training-data feature).
    Capture semantics, pinned deterministic: an <a href=…> opens a
    capture; it ends at the matching </a> OR at the next <a …> (the
    browser's implicit close for nested anchors); text is the
    whitespace-normalized concatenation of every text node in between
    (nested inline tags contribute their text). Falsy hrefs skipped,
    same as _AnchorCollector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pairs: list[tuple[str, str]] = []
        self._href: str | None = None
        self._buf: list[str] = []

    def _close_open(self) -> None:
        if self._href is not None:
            text = " ".join("".join(self._buf).split())
            self.pairs.append((self._href, text))
            self._href = None
            self._buf = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        self._close_open()
        for name, value in attrs:
            if name == "href":
                if value:
                    self._href = value
                break

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)
        if tag == "a":
            self._close_open()

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._close_open()

    def handle_data(self, data: str) -> None:
        if self._href is not None:
            self._buf.append(data)

    def error(self, message: str) -> None:  # pragma: no cover
        pass


def extract_anchor_pairs_py(html: str) -> list[tuple[str, str]]:
    """(raw href, anchor text) of all anchors, document order; [] on
    any parse issue (same never-throw contract as extract_links_py)."""
    if not html:
        return []
    collector = _AnchorTextCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        pass
    collector._close_open()  # unterminated trailing <a>
    return collector.pairs


def extract_links_py(html: str) -> list[str]:
    """Raw hrefs of all anchors, document order; [] on any parse issue."""
    if not html:
        return []
    collector = _AnchorCollector()
    try:
        collector.feed(html)
        collector.close()
    except Exception:
        # cheerio-parity: parsing must never throw (crawler.js:76-86)
        return collector.hrefs
    return collector.hrefs


def decode_body_py(raw: bytes | None, gzipped: bool) -> str:
    """gunzip-if-needed + UTF-8 decode, Buffer.toString() semantics."""
    if raw is None:
        return ""
    data = bytes(raw)
    if gzipped:
        try:
            data = zlib.decompress(data, wbits=47)  # auto gzip/zlib header
        except zlib.error:
            return ""
    return data.decode("utf-8", errors="replace")


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links(html: pd.Series) -> pd.Series:
    """P5 — vectorized (Arrow-batched) anchor extraction."""
    return pd.Series(
        [extract_links_py(h) for h in html.fillna("")], index=html.index
    )


BODY_LINKS_TYPE = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(BODY_LINKS_TYPE)
def decode_extract_resolve(
    raw: pd.Series, gzipped: pd.Series, page_url: pd.Series
) -> pd.DataFrame:
    """P7 + P5 + P4 fused: gunzip/decode, anchor extraction and
    link resolution in ONE Arrow round-trip. The three-stage form
    (decode_body → extract_links → resolve_links) moves the body text
    across the JVM↔Python socket three times; at crawl scale the body
    bytes dominate traffic, so the fused kernel is the hot path."""
    from node_crawler_spark.functions.urlkit import resolve_many

    gz = gzipped.fillna(False)
    texts, links = [], []
    for r, g, base in zip(raw, gz, page_url.fillna("")):
        t = decode_body_py(r, bool(g))
        texts.append(t)
        if t:
            links.append(resolve_many(base, extract_links_py(t)))
        else:
            links.append([])
    return pd.DataFrame({"text": texts, "links": links}, index=raw.index)


@F.pandas_udf(T.StringType())
def decode_body(raw: pd.Series, gzipped: pd.Series) -> pd.Series:
    """P7 — gunzip + UTF-8 decode; byte-identical to the reference's
    ``body.toString()`` for valid UTF-8/gzip input."""
    gz = gzipped.fillna(False)
    return pd.Series(
        [decode_body_py(r, bool(g)) for r, g in zip(raw, gz)],
        index=raw.index,
    )
