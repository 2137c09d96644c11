"""urlkit unit corpus — mirrors the reference's URL-identity specs.

Sources: tests/unit/queueSpec.js:47-56, tests/unit/wasCrawledSpec.js,
tests/func/pageSpec.js:11-25/74-92, tests/unit/page/pageAddLinkSpec.js,
tests/unit/isExternalSpec.js:12-40.
"""

from __future__ import annotations

import pandas as pd
import pytest

from node_crawler_spark.functions.urlkit import (
    node_href,
    node_parse,
    node_resolve,
    strip_fragment,
)


class TestNodeHref:
    # queueSpec.js:47-56 — the canonical trailing-slash case
    def test_trailing_slash_inserted(self):
        assert node_href("http://www.google.com") == "http://www.google.com/"

    def test_idempotent(self):
        assert node_href("http://www.google.com/") == "http://www.google.com/"

    def test_keeps_fragment(self):
        # seen-set keys keep fragments (crawler.js:588 href includes hash)
        assert node_href("http://a.com/x#frag") == "http://a.com/x#frag"
        assert node_href("http://a.com#frag") == "http://a.com/#frag"

    def test_keeps_query(self):
        assert node_href("http://a.com/x?q=1&b=2") == "http://a.com/x?q=1&b=2"

    def test_lowercases_scheme_and_host(self):
        assert node_href("HTTP://WWW.Example.COM/Path") == "http://www.example.com/Path"

    def test_keeps_port(self):
        # Node legacy parse does NOT strip default ports
        assert node_href("http://a.com:80/x") == "http://a.com:80/x"
        assert node_href("http://a.com:8080") == "http://a.com:8080/"

    def test_auth_preserved(self):
        assert node_href("http://user:pw@a.com/x") == "http://user:pw@a.com/x"

    def test_space_escaped(self):
        assert node_href("http://a.com/a b") == "http://a.com/a%20b"

    def test_mailto(self):
        assert node_href("mailto:someone@example.com") == "mailto:someone@example.com"

    def test_javascript(self):
        assert node_href("javascript:void(0)") == "javascript:void(0)"

    def test_tel(self):
        assert node_href("tel:+1-234-567") == "tel:+1-234-567"

    def test_empty_and_none(self):
        # wasCrawledSpec.js:38-44 — non-strings coerce to ''
        assert node_href("") == ""
        assert node_href(None) == ""

    def test_https(self):
        assert node_href("https://secure.example.com") == "https://secure.example.com/"


class TestNodeParse:
    # pageSpec.js:11-25
    def test_components(self):
        d = node_parse("http://www.google.com/")
        assert d["protocol"] == "http:"
        assert d["host"] == "www.google.com"
        assert d["hostname"] == "www.google.com"
        assert d["pathname"] == "/"
        assert d["href"] == "http://www.google.com/"

    def test_hash_component(self):
        d = node_parse("http://www.google.com/#hash")
        assert d["hash"] == "#hash"
        assert d["href"] == "http://www.google.com/#hash"

    def test_host_with_port(self):
        d = node_parse("http://a.com:8080/p?q=1#f")
        assert d["host"] == "a.com:8080"
        assert d["hostname"] == "a.com"
        assert d["port"] == "8080"
        assert d["pathname"] == "/p"
        assert d["search"] == "?q=1"
        assert d["hash"] == "#f"

    def test_non_page_protocols(self):
        assert node_parse("mailto:a@b.com")["protocol"] == "mailto:"
        assert node_parse("javascript:void(0)")["protocol"] == "javascript:"
        assert node_parse("tel:+123")["protocol"] == "tel:"
        # host is empty for all of them (crawler.js:139-146 filter)
        assert node_parse("mailto:a@b.com")["host"] == ""

    def test_bare_http_scheme_has_empty_host(self):
        # responseSuccessSpec.js:65-96: 'http://' link dropped via host==''
        assert node_parse("http://")["host"] == ""


class TestNodeResolve:
    # pageSpec.js:74-92
    def test_absolute_path(self):
        assert (
            node_resolve("http://www.google.com/", "/I-am-relative")
            == "http://www.google.com/I-am-relative"
        )

    def test_relative_in_section(self):
        assert (
            node_resolve("http://www.google.com/section/", "I-am-relative")
            == "http://www.google.com/section/I-am-relative"
        )

    def test_relative_off_sibling(self):
        assert (
            node_resolve("http://www.google.com/sibling", "I-am-relative")
            == "http://www.google.com/I-am-relative"
        )

    def test_parent_traversal(self):
        assert (
            node_resolve("http://a.com/x/y/z", "../../up")
            == "http://a.com/up"
        )

    def test_absolute_href_wins(self):
        assert (
            node_resolve("http://a.com/x", "http://google.com")
            == "http://google.com/"
        )

    def test_fragment_only(self):
        assert node_resolve("http://a.com/x", "#frag") == "http://a.com/x#frag"

    def test_mailto_passthrough(self):
        assert node_resolve("http://a.com/", "mailto:x@y.z") == "mailto:x@y.z"

    def test_javascript_passthrough(self):
        assert node_resolve("http://a.com/", "javascript:void(0)") == "javascript:void(0)"

    def test_scheme_relative(self):
        assert node_resolve("http://a.com/x", "//b.com/y") == "http://b.com/y"

    def test_empty_href_returns_base(self):
        assert node_resolve("http://a.com/x", "") == "http://a.com/x"

    def test_idempotent_on_resolved(self):
        # crawler.js:135 re-resolves already-resolved links
        u = node_resolve("http://a.com/dir/", "page.html")
        assert node_resolve("http://a.com/dir/", u) == u


class TestStripFragment:
    # crawler.js:66, pageSpec.js:21-25
    def test_strip(self):
        assert strip_fragment("http://www.google.com/#hash") == "http://www.google.com/"

    def test_noop(self):
        assert strip_fragment("http://www.google.com/") == "http://www.google.com/"

    def test_everything_after_first_hash(self):
        assert strip_fragment("http://a/#x#y") == "http://a/"


class TestIsExternalTruthTable:
    # isExternalSpec.js:12-40 — protocol OR host differ
    @pytest.mark.parametrize(
        "base,url,expected",
        [
            ("http://www.google.com/", "http://www.windows.com/", True),
            ("http://google.com/", "http://www.google.com/", True),  # www counts
            ("http://www.google.com/", "https://www.google.com/", True),  # scheme
            ("http://www.google.com/", "ftp://www.google.com/", True),
            ("http://www.google.com/", "http://www.google.com/", False),
            ("http://www.google.com/", "http://www.google.com/some/page.html", False),
        ],
    )
    def test_cases(self, base, url, expected):
        b, u = node_parse(base), node_parse(url)
        is_ext = (u["protocol"] != b["protocol"]) or (u["host"] != b["host"])
        assert is_ext is expected


class TestSparkUDFs:
    def test_canonicalize_udf(self, spark):
        from node_crawler_spark.functions.urlkit import canonicalize_url

        df = spark.createDataFrame(
            [("http://www.google.com",), ("HTTP://A.COM/Path#f",), (None,)],
            ["url"],
        )
        got = [r[0] for r in df.select(canonicalize_url("url")).collect()]
        assert got == ["http://www.google.com/", "http://a.com/Path#f", ""]

    def test_resolve_udf(self, spark):
        from node_crawler_spark.functions.urlkit import resolve_url

        df = spark.createDataFrame(
            [("http://www.google.com/sibling", "I-am-relative")],
            ["base", "href"],
        )
        got = df.select(resolve_url("base", "href")).collect()[0][0]
        assert got == "http://www.google.com/I-am-relative"

    def test_parse_struct_udf(self, spark):
        from node_crawler_spark.functions.urlkit import parse_url_struct

        df = spark.createDataFrame([("http://a.com:81/p?q#h",)], ["url"])
        row = df.select(parse_url_struct("url").alias("d")).collect()[0]["d"]
        assert row["protocol"] == "http:"
        assert row["host"] == "a.com:81"
        assert row["pathname"] == "/p"
        assert row["hash"] == "#h"

    def test_fast_path_matches_slow_path(self):
        # every fast-path-accepted URL must round-trip node_href unchanged
        from node_crawler_spark.functions.urlkit import _CANONICAL_RE

        urls = [
            "http://a.com/",
            "https://b.example.org:8080/x/y?q=1",
            "http://c.com/path#frag",
            "http://d.com/UPPER/Case",
        ]
        for u in urls:
            assert _CANONICAL_RE.match(u), u
            assert node_href(u) == u


class TestHtmlFunctions:
    def test_extract_links_order_and_dupes(self):
        from node_crawler_spark.functions.html import extract_links_py

        html = (
            '<a href="/one">1</a><a href="/two">2</a>'
            '<a href="/one">dup</a><a>nohref</a><a href="">empty</a>'
        )
        assert extract_links_py(html) == ["/one", "/two", "/one"]

    def test_malformed_html_no_crash(self):
        # pageSpec.js:45-48
        from node_crawler_spark.functions.html import extract_links_py

        assert extract_links_py("$$&($#*(#*$@($</html><div><div>") == []

    def test_entity_decoding_in_href(self):
        from node_crawler_spark.functions.html import extract_links_py

        assert extract_links_py('<a href="/a&amp;b">x</a>') == ["/a&b"]

    def test_gzip_decode(self):
        import gzip

        from node_crawler_spark.functions.html import decode_body_py

        raw = gzip.compress("some text".encode())
        assert decode_body_py(raw, True) == "some text"
        assert decode_body_py(b"plain", False) == "plain"
        assert decode_body_py(None, False) == ""

    def test_decode_invalid_utf8_replacement(self):
        # Buffer.toString() semantics: invalid bytes → U+FFFD
        from node_crawler_spark.functions.html import decode_body_py

        assert decode_body_py(b"a\xffb", False) == "a�b"

    def test_extract_links_udf(self, spark):
        from pyspark.sql import functions as F

        from node_crawler_spark.functions.html import extract_links

        df = spark.createDataFrame([('<a href="/x">l</a>',), (None,)], ["html"])
        got = df.select(extract_links("html").alias("links")).collect()
        assert got[0]["links"] == ["/x"]
        assert got[1]["links"] == []


def test_resolve_many_equals_node_resolve():
    """The batched origin fast path must be indistinguishable from the
    scalar resolver on every link shape, including the ones it must
    NOT fast-path (protocol-relative, query, fragment, escapables,
    relative, auth'd or non-canonical bases)."""
    from node_crawler_spark.functions.urlkit import node_resolve, resolve_many

    bases = [
        "http://www.site.test/",
        "http://www.site.test/deep/dir/page",
        "https://host.test:8443/x?q=1#f",
        "http://user:pw@host.test/x",        # auth → no fast path
        "HTTP://UPPER.test/x",               # non-canonical → no fast path
        "ftp://files.test/pub/",
        "",
    ]
    hrefs = [
        "/", "/abs", "/abs/deeper", "/p123",
        "//proto.relative.test/x",            # protocol-relative
        "/with?query=1", "/with#frag", "/with space", '/quo"te',
        "sibling", "../up", "section/", "#frag", "?q=2",
        "http://absolute.test/y", "mailto:a@b.test", "javascript:void(0)",
        "", "  /padded  ",
    ]
    for b in bases:
        got = resolve_many(b, hrefs)
        want = [node_resolve(b, h) for h in hrefs]
        assert got == want, (b, [(h, g, w) for h, g, w in zip(hrefs, got, want) if g != w])


def test_hostport_col_matches_node_parse_host(spark):
    """Spark's parse_url has no PORT part key (returns NULL) — the
    AUTHORITY-based hostport_col must agree with node_parse()['host']
    (lowercase, port kept, userinfo dropped) so every domain key
    (politeness, seen-salt, externality, robots) matches the
    simulator on urls with explicit ports."""
    from pyspark.sql import functions as F

    from node_crawler_spark.functions.urlkit import hostport_col, node_parse

    urls = [
        "http://a.test/x",
        "http://a.test:8080/x",
        "HTTP://UPPER.test:8080/x",
        "http://user:pw@b.test:81/y",
        "http://c.test",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.url: r.hp
        for r in df.select("url", hostport_col(F.col("url")).alias("hp")).collect()
    }
    for u in urls:
        assert got[u] == node_parse(u)["host"], u
