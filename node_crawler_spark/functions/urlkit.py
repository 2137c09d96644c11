"""urlkit — Node-legacy ``url.parse`` / ``url.resolve`` semantics.

This is THE identity function of the crawl: the reference dedups on
``urllib.parse(url).href`` (crawler.js:176-194, :588) and resolves
links with ``urllib.resolve`` (crawler.js:91, :135). Every downstream
identity (seen-set key, fetch key, golden crawl order) depends on
byte-exact hrefs, so the pure-Python core here replicates Node's
*legacy* url module rules (not WHATWG):

  * scheme lowercased; ``//`` slashes for slashed protocols
  * auth (``user:pass@``) preserved verbatim
  * hostname lowercased, ports preserved (no default-port stripping —
    legacy parse keeps ``:80``), IDNA/punycode for non-ASCII hosts
  * empty path with a host present becomes ``/``
    (tests/unit/queueSpec.js:47-56: http://www.google.com →
    http://www.google.com/)
  * query AND fragment retained in href (the seen-set keeps fragments;
    only Page construction strips them — crawler.js:66 vs :588)
  * Node's autoEscape set (space, quotes, angle brackets, backtick,
    braces, pipe, backslash, caret, TAB/CR/LF) percent-encoded in the
    path

The Spark surface is Arrow-vectorized pandas UDFs with a regex fast
path: URLs already in canonical form (the overwhelming majority in a
real crawl, where links come out of our own resolver) are recognized
with a single vectorized match and passed through untouched; only the
residue takes the per-element slow path.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Node url.js: slashedProtocol map (legacy url module)
SLASHED_PROTOCOLS = {"http:", "https:", "ftp:", "gopher:", "file:", "ws:", "wss:"}
# Protocols the reference filters out as non-page links (crawler.js:139-146)
NON_PAGE_PROTOCOLS = ("mailto:", "javascript:", "tel:")

_PROTO_RE = re.compile(r"^([a-zA-Z0-9.+-]+:)")
# Node legacy parse autoEscape = delims + unwise + ["'"]
_AUTO_ESCAPE = set(" \t\n\r\"'<>`{}|\\^")
_ESCAPE_MAP = {c: "%{:02X}".format(ord(c)) for c in _AUTO_ESCAPE}

# Fast path: canonical-form URL that round-trips through node_href
# unchanged. Lowercase scheme+host, non-empty path, no escapable chars,
# no auth (auth is rare; send it to the slow path).
_CANONICAL_RE = re.compile(
    r"^(?:http|https|ftp|ws|wss):\/\/"
    r"[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?(?::\d+)?"
    r"\/[^ \t\n\r\"'<>`{}|\\^@]*$"
)


def _escape_rest(s: str) -> str:
    """Percent-encode Node's autoEscape chars (uppercase hex)."""
    if not s:
        return s
    for ch in _AUTO_ESCAPE:
        if ch in s:
            return "".join(_ESCAPE_MAP.get(c, c) for c in s)
    return s


def node_parse(url: str) -> dict:
    """Parse like Node legacy ``url.parse(url)``.

    Returns protocol, slashes, auth, hostname, port, host, pathname,
    search ('?'-prefixed or ''), hash ('#'-prefixed or ''), href.
    Mirrors crawler.js usage: urlData fields asserted in
    tests/func/pageSpec.js:11-25.
    """
    s = "" if url is None else str(url).strip()
    out = {
        "protocol": "",
        "slashes": False,
        "auth": "",
        "hostname": "",
        "port": "",
        "host": "",
        "pathname": "",
        "search": "",
        "hash": "",
        "href": "",
    }
    if not s:
        return out

    m = _PROTO_RE.match(s)
    proto = ""
    rest = s
    if m:
        proto = m.group(1).lower()
        rest = s[m.end():]
    out["protocol"] = proto

    slashes = rest.startswith("//")
    has_host = proto in SLASHED_PROTOCOLS or (slashes and proto != "javascript:")
    if has_host:
        if slashes:
            rest = rest[2:]
        out["slashes"] = True
        # authority = up to first /?#
        end = len(rest)
        for i, c in enumerate(rest):
            if c in "/?#":
                end = i
                break
        authority, rest = rest[:end], rest[end:]
        if "@" in authority:
            at = authority.rindex("@")
            out["auth"], authority = authority[:at], authority[at + 1:]
        # split port (last ':' followed by digits only)
        hostname, port = authority, ""
        cm = re.search(r":(\d*)$", authority)
        if cm:
            hostname, port = authority[: cm.start()], cm.group(1)
        hostname = hostname.lower()
        if not hostname.isascii():
            try:  # Node punycodes non-ASCII hosts (legacy parse)
                hostname = hostname.encode("idna").decode("ascii")
            except (UnicodeError, UnicodeDecodeError):
                pass
        out["hostname"] = hostname
        out["port"] = port
        out["host"] = hostname + ((":" + port) if port else "")
        # path / query / fragment
        path, query, frag = rest, "", ""
        hi = path.find("#")
        if hi >= 0:
            path, frag = path[:hi], path[hi:]
        qi = path.find("?")
        if qi >= 0:
            path, query = path[:qi], path[qi:]
        if path == "":
            path = "/"  # queueSpec.js:47-56 trailing-slash insertion
        out["pathname"] = _escape_rest(path)
        out["search"] = _escape_rest(query)
        out["hash"] = frag
        auth_part = (out["auth"] + "@") if out["auth"] else ""
        out["href"] = (
            proto + "//" + auth_part + out["host"] + out["pathname"]
            + out["search"] + out["hash"]
        )
    else:
        # host-less (mailto:, javascript:, tel:, relative paths, ...)
        path, query, frag = rest, "", ""
        hi = path.find("#")
        if hi >= 0:
            path, frag = path[:hi], path[hi:]
        qi = path.find("?")
        if qi >= 0:
            path, query = path[:qi], path[qi:]
        out["pathname"] = path
        out["search"] = query
        out["hash"] = frag
        out["href"] = proto + path + query + frag
    return out


def node_href(url: str) -> str:
    """``urllib.parse(url).href`` — the canonical seen-set key
    (crawler.js:187-189, :588)."""
    if url is not None and _CANONICAL_RE.match(str(url)):
        return str(url)
    return node_parse(url)["href"]


# resolve fast path: absolute-path href with no query/fragment/escapable
# chars against a canonical slashed-protocol base — the dominant link
# shape in a domain crawl ("/p123" against "http://host/...").
_SIMPLE_ABS_PATH_RE = re.compile(r"^/(?:[^/ \t\n\r\"'<>`{}|\\^#?][^ \t\n\r\"'<>`{}|\\^#?]*)?$")
_ORIGIN_RE = re.compile(
    r"^((?:http|https|ftp|ws|wss)://[a-z0-9](?:[a-z0-9.-]*[a-z0-9])?(?::\d+)?)/"
)


def resolve_many(base: str, hrefs) -> list[str]:
    """node_resolve for a page's whole href list: the base's origin is
    matched ONCE and same-origin absolute-path links concatenate
    directly (provably equal to urljoin+node_href for this shape);
    everything else takes the full path. Semantics identical to
    [node_resolve(base, h) for h in hrefs] — pinned by
    tests/test_urlkit.py::test_resolve_many_equals_node_resolve."""
    b = "" if base is None else str(base)
    om = _ORIGIN_RE.match(b)
    origin = om.group(1) if om else None
    out = []
    for href in hrefs:
        h = "" if href is None else str(href).strip()
        if origin is not None and h.startswith("/") and _SIMPLE_ABS_PATH_RE.match(h):
            out.append(origin + h)
        else:
            out.append(node_resolve(b, h))
    return out


def node_resolve(base: str, href: str) -> str:
    """``urllib.resolve(base, href)`` (crawler.js:91, :135).

    Node resolve = format(parse(base).resolveObject(href)) — i.e. the
    result is *normalized* (lowercased scheme/host, trailing slash on
    empty path). RFC-3986 join via urljoin, then node_href-normalize.
    Covers the pageAddLinkSpec.js:17-21 / pageSpec.js:74-92 forms
    (/abs, sibling, ../up, section/).
    """
    b = "" if base is None else str(base)
    h = "" if href is None else str(href).strip()
    if not h:
        return node_href(b)
    m = _PROTO_RE.match(h)
    if m and m.group(1).lower() not in SLASHED_PROTOCOLS:
        # mailto:/javascript:/tel:/data: — absolute, non-hierarchical.
        # Node still normalizes the scheme case (url.parse lowercases
        # protocol); property test found 'A:80' escaping un-normalized.
        return node_href(h)
    try:
        joined = urljoin(b, h)
    except ValueError:
        joined = h
    return node_href(joined)


def strip_fragment(url: str) -> str:
    """Page-construction fragment strip: ``url.replace(/#.*/gi, '')``
    (crawler.js:66). NOT applied to seen-set keys."""
    if url is None:
        return ""
    i = str(url).find("#")
    return str(url)[:i] if i >= 0 else str(url)


# ---------------------------------------------------------------------------
# Arrow-vectorized Spark surface
# ---------------------------------------------------------------------------

URLDATA_TYPE = T.StructType(
    [
        T.StructField("protocol", T.StringType()),
        T.StructField("auth", T.StringType()),
        T.StructField("hostname", T.StringType()),
        T.StructField("port", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("pathname", T.StringType()),
        T.StructField("search", T.StringType()),
        T.StructField("hash", T.StringType()),
        T.StructField("href", T.StringType()),
    ]
)


def hostport_col(c):
    """JVM-side host[:port] of a url column, matching ``node_parse``'s
    ``host`` (lowercased, port kept, userinfo dropped). Built from
    parse_url AUTHORITY because Spark's parse_url has NO ``PORT`` part
    key — asking for it silently returns NULL, which is how the
    previous HOST+PORT concat dropped every explicit port."""
    auth = F.coalesce(F.parse_url(c, F.lit("AUTHORITY")), F.lit(""))
    return F.lower(F.substring_index(auth, "@", -1))


@F.pandas_udf(T.StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    """P1 — vectorized canonical href. Fast path: a single vectorized
    regex match passes already-canonical URLs through; only the residue
    runs the per-element Node-parse."""
    s = urls.fillna("").astype(str)
    is_canon = s.str.match(_CANONICAL_RE)
    if bool(is_canon.all()):
        return s
    out = s.copy()
    slow = ~is_canon
    out[slow] = [node_href(u) for u in s[slow]]
    return out


@F.pandas_udf(T.StringType())
def resolve_url(base: pd.Series, href: pd.Series) -> pd.Series:
    """P4 — RFC-3986 join with Node-normalized output."""
    b = base.fillna("").astype(str)
    h = href.fillna("").astype(str)
    return pd.Series(
        [node_resolve(x, y) for x, y in zip(b, h)], index=base.index
    )


@F.pandas_udf(T.ArrayType(T.StringType()))
def resolve_links(base: pd.Series, links: pd.Series) -> pd.Series:
    """P4/P5 composition — resolve every raw href of a page against the
    page url in one Arrow batch, preserving document order
    (Page.addLink, crawler.js:91: ``urllib.resolve(this.url, url)``).
    Keeps the sink's ``links`` column shuffle-free (no explode +
    re-collect_list round trip)."""
    b = base.fillna("").astype(str)
    out = []
    for page_url, hrefs in zip(b, links):
        if hrefs is None or len(hrefs) == 0:
            out.append([])
        else:
            out.append(resolve_many(page_url, hrefs))
    return pd.Series(out, index=base.index)


@F.pandas_udf(URLDATA_TYPE)
def parse_url_struct(urls: pd.Series) -> pd.DataFrame:
    """P3 — full Node urlData struct (for F1/F2 predicates and tests)."""
    rows = [node_parse(u) for u in urls.fillna("").astype(str)]
    return pd.DataFrame(
        rows,
        columns=[
            "protocol", "auth", "hostname", "port", "host",
            "pathname", "search", "hash", "href",
        ],
        index=urls.index,
    )


def strip_fragment_col(col):
    """P2 as a pure built-in (no UDF): regexp_replace(url, '#.*', '')."""
    return F.regexp_replace(col, "#.*", "")


def url_domain_col(col):
    """Registrable-ish domain key for politeness/salting: the legacy
    ``host`` (hostname:port). Built-in parse_url stays JVM-side."""
    return hostport_col(col)
